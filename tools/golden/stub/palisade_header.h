// Plaintext stand-in for the reference fork's HE veneer (palisade_header.h).
//
// The fork encrypts values and immediately decrypts them for every control
// decision (SURVEY.md §0; e.g. FMI_search.cpp:1549-1554), so "ciphertexts"
// that are just the plaintext integers reproduce the plaintext semantics
// bit-for-bit while letting the reference kernels compile without the
// PALISADE library.  Used ONLY by the golden-fixture harnesses in
// tools/golden/ — never linked into the framework.
//
// Helper semantics transcribed from /root/reference/palisade_header.cpp
// (bit vectors are MSB-first: get_encrypted_bits_vector,
// shift_encrypted_bit_vector_and_return_integer negative n == right shift).
#ifndef GOLDEN_STUB_PALISADE_HEADER_H
#define GOLDEN_STUB_PALISADE_HEADER_H

#include <cstdint>
#include <cstring>
#include <functional>
#include <iostream>
#include <map>
#include <string>
#include <vector>

using namespace std;

// raw PALISADE type names used directly by some reference files (kseq.h)
struct DCRTPoly {};
template <class T> using Ciphertext = long long;
using Plaintext = long long;

using CT = long long;
using PT = long long;
using vecCT = std::vector<CT>;
using vecPT = std::vector<PT>;
using vecInt = std::vector<int64_t>;
using vecChar = std::vector<char>;

// serializer stubs: live only in packed_cts codepaths the harnesses never
// call (e.g. bns_restore's p_name reads); always report failure if reached
struct SerTypeTag {};
struct SerType {
    static constexpr SerTypeTag BINARY{};
    static constexpr SerTypeTag JSON{};
};
struct Serial {
    template <class T>
    static bool DeserializeFromFile(const std::string&, T&, SerTypeTag) {
        return false;
    }
    template <class T>
    static bool SerializeToFile(const std::string&, const T&, SerTypeTag) {
        return false;
    }
};

struct StubEval {
    CT EvalAdd(CT a, CT b) const { return a + b; }
    CT EvalSub(CT a, CT b) const { return a - b; }
    CT EvalMult(CT a, CT b) const { return a * b; }
};
struct StubCC {
    StubEval ev;
    const StubEval* operator->() const { return &ev; }
};
inline StubCC cc;
inline bool init_flag = false;
inline uint64_t p = 12869861377ULL;
inline double sigma = 3.2;
inline long sa_ms_byte_enc_counter = 0;
inline long sa_ls_word_enc_counter = 0;

inline void init() { init_flag = true; }

inline std::vector<int64_t> decrypt_ciphertext_to_plaintext_vector(CT c) {
    return {c};
}
inline CT encrypt_plaintext_integer_to_ciphertext(int64_t c) { return c; }
inline CT encrypt_plaintext_vector_to_ciphertext(std::vector<int64_t> d) {
    return d.empty() ? 0 : d[0];
}
inline PT encode_integer_to_plaintext(int64_t c) { return c; }
inline PT encode_vector_to_plaintext(vecInt c) { return c.empty() ? 0 : c[0]; }

// bit vectors are MSB-first (palisade_header.cpp get_encrypted_bits_vector)
inline std::vector<CT> get_encrypted_bits_vector(int64_t n) {
    std::vector<CT> v;
    do {
        v.insert(v.begin(), (CT)(n % 2));
        n /= 2;
    } while (n != 0);
    return v;
}

inline CT shift_left(CT c, int n) { return c << n; }

inline CT shift_encrypted_bit_vector_and_return_integer(
    std::vector<CT> bits, int64_t n) {
    long long v = 0;
    for (CT b : bits) v = v * 2 + b;
    if (n > 0) return v << n;
    if (-n > (int64_t)bits.size()) return 0;
    return v >> (-n);
}

inline int64_t operate_and_decrypt(CT c1, const std::string& oper, CT c2) {
    if (oper == "-") return c1 - c2;
    if (oper == "+") return c1 + c2;
    if (oper == "*") return c1 * c2;
    return 0;
}
// equality predicate: 1 if equal, 0 otherwise (palisade_header.cpp compare_enc)
inline int64_t compare_enc(CT c1, CT c2) { return c1 == c2 ? 1 : 0; }

inline int strlen_enc(vecCT v) {
    int sz = 0;
    for (size_t i = 0; i < v.size() && v[i] != 0; i++) sz++;
    return sz;
}
inline int strlen_string_enc(vecCT v) { return strlen_enc(v); }

inline void assign_string_to_vecCT(vecCT& v, const char* c, int len) {
    if (len == -1) len = (int)strlen(c);
    if ((int)v.size() < len + 1) v.resize(len + 1);
    for (int i = 0; i < len; i++) v[i] = (CT)c[i];
    v[len] = 0;
}

inline char* convert_ciphertext_vector_to_plaintext_string(vecCT enc_v) {
    char* s = (char*)malloc(enc_v.size() + 1);
    size_t i = 0;
    for (; i < enc_v.size(); i++) s[i] = (char)enc_v[i];
    s[i] = '\0';
    return s;
}
inline std::vector<int64_t> convert_ciphertext_vector_to_plaintext_vector(
    vecCT enc_v) {
    std::vector<int64_t> v(enc_v.size());
    for (size_t i = 0; i < enc_v.size(); i++) v[i] = enc_v[i];
    return v;
}

inline int64_t strcmp_enc(vecCT v, const char* s) {
    size_t i = 0;
    for (; i < v.size() && s[i]; i++)
        if (v[i] != (CT)s[i]) return v[i] - (CT)s[i];
    if (i < v.size() && v[i] != 0) return v[i];
    if (s[i]) return -(CT)s[i];
    return 0;
}
inline int64_t strcmp_enc(const char* s, vecCT v) { return -strcmp_enc(v, s); }
inline int64_t strcmp_enc(vecCT a, vecCT b) {
    size_t i = 0;
    for (; i < a.size() && i < b.size(); i++)
        if (a[i] != b[i]) return a[i] - b[i];
    return (int64_t)a.size() - (int64_t)b.size();
}

inline void strdup_enc(vecCT s, vecCT& d) { d = s; }
inline void strcat_enc(vecCT& s, const char* a, int index) {
    if (index == -1) index = strlen_enc(s) - 1;
    int i = index;
    for (; a[i - index]; i++) {
        if (i >= (int)s.size()) s.resize(i + 1);
        s[i] = (CT)a[i - index];
    }
    if (i >= (int)s.size()) s.resize(i + 1);
    s[i] = 0;
}

inline CT do_logical_and_of_encryted_bit_vectors(vecCT a, vecCT b) {
    long long va = 0, vb = 0;
    for (CT x : a) va = va * 2 + x;
    for (CT x : b) vb = vb * 2 + x;
    return va & vb;
}

inline int64_t compare_element_at_index_in_ct_and_other_element(CT c, int index,
                                                                int64_t ele) {
    (void)index;
    return c == ele ? 1 : 0;
}

// packed-ciphertext index accessors: the fork reads serialized ciphertext
// shards (packed_cts/) here; the harness installs hooks that return the
// same values from the in-memory plaintext index instead.
inline std::function<int64_t(int64_t, int64_t)> g_cp_occ_one_hot_hook;
inline std::function<int64_t(int64_t, int64_t)> g_cp_occ_cp_count_hook;
inline std::function<int64_t(int64_t)> g_sa_ls_word_hook;
inline std::function<int64_t(int64_t)> g_sa_ms_byte_hook;

inline CT cp_occ_one_hot_bwt_str_i(int64_t i, int64_t j) {
    return g_cp_occ_one_hot_hook(i, j);
}
inline CT cp_occ_cp_count_i(int64_t i, int64_t j) {
    return g_cp_occ_cp_count_hook(i, j);
}
inline int64_t sa_ls_word_i(int64_t i) { return g_sa_ls_word_hook(i); }
inline int64_t sa_ms_byte_i(int64_t i) { return g_sa_ms_byte_hook(i); }
inline std::string p_str_i(int64_t i) { (void)i; return std::string(); }

#endif  // GOLDEN_STUB_PALISADE_HEADER_H
