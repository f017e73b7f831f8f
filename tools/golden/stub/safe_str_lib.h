// libc-backed stand-in for safestringlib's safe_str_lib.h, used only when
// compiling reference kernels for golden-fixture generation (the bounds
// arguments are honored via strn* so behavior matches on valid inputs).
#ifndef GOLDEN_STUB_SAFE_STR_LIB_H
#define GOLDEN_STUB_SAFE_STR_LIB_H

#include <string.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int errno_t;
#ifndef GOLDEN_RSIZE_T_DEFINED
#define GOLDEN_RSIZE_T_DEFINED
typedef size_t rsize_t;
#endif
#ifndef RSIZE_MAX_STR
#define RSIZE_MAX_STR (4UL << 20)
#endif
#ifndef RSIZE_MAX_MEM
#define RSIZE_MAX_MEM (256UL << 20)
#endif

static inline errno_t strcpy_s(char *dest, size_t dmax, const char *src) {
    if (!dest || !src || dmax == 0) return 1;
    strncpy(dest, src, dmax - 1);
    dest[dmax - 1] = '\0';
    return 0;
}

static inline errno_t strcat_s(char *dest, size_t dmax, const char *src) {
    if (!dest || !src || dmax == 0) return 1;
    size_t dlen = strnlen(dest, dmax);
    if (dlen >= dmax) return 1;
    strncpy(dest + dlen, src, dmax - dlen - 1);
    dest[dmax - 1] = '\0';
    return 0;
}

static inline errno_t strncpy_s(char *dest, size_t dmax, const char *src,
                                size_t slen) {
    if (!dest || !src || dmax == 0) return 1;
    size_t n = slen < dmax - 1 ? slen : dmax - 1;
    strncpy(dest, src, n);
    dest[n] = '\0';
    return 0;
}

static inline errno_t memcpy_s(void *dest, size_t dmax, const void *src,
                               size_t n) {
    if (!dest || !src || n > dmax) return 1;
    memcpy(dest, src, n);
    return 0;
}

static inline errno_t memset_s(void *dest, size_t dmax, int c, size_t n) {
    if (!dest || n > dmax) return 1;
    memset(dest, c, n);
    return 0;
}

#ifdef __cplusplus
}
#endif

#endif  // GOLDEN_STUB_SAFE_STR_LIB_H
