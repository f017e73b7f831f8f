// SA-IS suffix array construction (Nong, Zhang, Chan 2009), written from
// the published algorithm: classify L/S types, induced-sort LMS substrings,
// name them, recurse on the reduced string if names repeat, then induce the
// final order from the sorted LMS suffixes.
//
// Role in the framework: the FM-index builder (bwa-mem2 build_index
// capability, tools/bwa-mem2/src/FMI_search.cpp:358 in the reference uses
// its own sais) calls gt_sais() on the 2-bit packed fwd+revcomp text.
//
// Convention: works on an integer string that ends with a unique smallest
// sentinel (value 0, appended by the C wrapper).  All internal indices are
// int64 so genome-scale (>2^31) texts work.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using std::vector;

template <typename T>
void get_counts(const T* s, int64_t n, int64_t K, vector<int64_t>& C) {
    std::fill(C.begin(), C.end(), 0);
    for (int64_t i = 0; i < n; i++) C[(int64_t)s[i]]++;
}

static void get_buckets(const vector<int64_t>& C, vector<int64_t>& B,
                        int64_t K, bool end) {
    int64_t sum = 0;
    for (int64_t c = 0; c < K; c++) {
        sum += C[c];
        B[c] = end ? sum : sum - C[c];
    }
}

// t[i] = true iff suffix i is S-type
template <typename T>
void classify(const T* s, int64_t n, vector<bool>& t) {
    t[n - 1] = true;  // the sentinel suffix is S-type by definition
    for (int64_t i = n - 2; i >= 0; i--)
        t[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && t[i + 1]);
}

template <typename T>
void induce(const T* s, int64_t* SA, int64_t n, int64_t K,
            const vector<bool>& t, vector<int64_t>& C, vector<int64_t>& B) {
    // induce L-type from sorted LMS (or sorted S) positions
    get_buckets(C, B, K, false);
    for (int64_t i = 0; i < n; i++) {
        int64_t j = SA[i] - 1;
        if (SA[i] > 0 && !t[j]) SA[B[(int64_t)s[j]]++] = j;
    }
    // induce S-type right-to-left
    get_buckets(C, B, K, true);
    for (int64_t i = n - 1; i >= 0; i--) {
        int64_t j = SA[i] - 1;
        if (SA[i] > 0 && t[j]) SA[--B[(int64_t)s[j]]] = j;
    }
}

template <typename T>
void sais_rec(const T* s, int64_t* SA, int64_t n, int64_t K) {
    if (n == 1) {
        SA[0] = 0;
        return;
    }
    vector<bool> t(n);
    classify(s, n, t);
    auto is_lms = [&](int64_t i) { return i > 0 && t[i] && !t[i - 1]; };

    vector<int64_t> C(K), B(K);
    get_counts(s, n, K, C);

    // stage 1: sort LMS substrings — drop LMS positions at bucket ends
    // (arbitrary order), then one induction round sorts the substrings
    std::fill(SA, SA + n, -1);
    get_buckets(C, B, K, true);
    for (int64_t i = n - 1; i >= 1; i--)
        if (is_lms(i)) SA[--B[(int64_t)s[i]]] = i;
    induce(s, SA, n, K, t, C, B);

    // compact the sorted LMS positions into the front of SA
    int64_t n1 = 0;
    for (int64_t i = 0; i < n; i++)
        if (is_lms(SA[i])) SA[n1++] = SA[i];

    // name LMS substrings in the upper half of SA
    int64_t* named = SA + n1;
    std::fill(named, SA + n, -1);
    int64_t name = 0, prev = -1;
    for (int64_t i = 0; i < n1; i++) {
        int64_t pos = SA[i];
        bool diff = false;
        if (prev < 0) {
            diff = true;
        } else {
            // compare LMS substrings at pos and prev (inclusive of both
            // bounding LMS characters; the sentinel terminates comparison)
            for (int64_t d = 0;; d++) {
                if (pos + d >= n || prev + d >= n ||
                    s[pos + d] != s[prev + d] ||
                    t[pos + d] != t[prev + d]) {
                    diff = true;
                    break;
                }
                if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) {
                    diff = !(is_lms(pos + d) && is_lms(prev + d));
                    break;
                }
            }
        }
        if (diff) {
            name++;
            prev = pos;
        }
        named[pos / 2] = name - 1;
    }
    // compact names into a reduced string (LMS text order) at SA[n-n1..n)
    int64_t* s1 = SA + n - n1;
    {
        int64_t j = n - 1;
        for (int64_t i = n - 1; i >= n1; i--)
            if (SA[i] >= 0) SA[j--] = SA[i];
    }

    int64_t* SA1 = SA;
    if (name < n1) {
        sais_rec(s1, SA1, n1, name);
    } else {
        for (int64_t i = 0; i < n1; i++) SA1[s1[i]] = i;
    }

    // map reduced-string positions back to LMS positions (in text order)
    // reuse s1 to hold the LMS position list
    {
        int64_t j = 0;
        for (int64_t i = 1; i < n; i++)
            if (is_lms(i)) s1[j++] = i;
    }
    for (int64_t i = 0; i < n1; i++) SA1[i] = s1[SA1[i]];

    // stage 2: place sorted LMS suffixes at bucket ends (reverse order)
    std::fill(SA + n1, SA + n, -1);
    get_buckets(C, B, K, true);
    for (int64_t i = n1 - 1; i >= 0; i--) {
        int64_t j = SA[i];
        SA[i] = -1;
        SA[--B[(int64_t)s[j]]] = j;
    }
    induce(s, SA, n, K, t, C, B);
}

}  // namespace

extern "C" {

// text: values in [1, K) (0 is reserved for the sentinel the wrapper
// appends).  sa_out: int64[n] receiving the suffix array of text[0..n-1]
// (sentinel row excluded).  Returns 0 on success.
int gt_sais_u8(const uint8_t* text, int64_t n, int64_t K, int64_t* sa_out) {
    if (n <= 0) return 0;
    vector<uint8_t> s(n + 1);
    std::memcpy(s.data(), text, n);
    s[n] = 0;
    vector<int64_t> SA(n + 1);
    sais_rec(s.data(), SA.data(), n + 1, K);
    // SA[0] is the sentinel suffix; drop it
    std::memcpy(sa_out, SA.data() + 1, n * sizeof(int64_t));
    return 0;
}

}  // extern "C"
