// Force-included before every reference TU in golden-harness builds:
// pulls the intrinsics first, then renames utils.h's conflicting
// __rdtsc redefinition (same semantics, different symbol).
#ifndef GOLDEN_PREINCLUDE_H
#define GOLDEN_PREINCLUDE_H
#include <immintrin.h>
#include <chrono>
#include <iostream>
#include <fstream>
#include <stddef.h>
#define __rdtsc bwa_utils_rdtsc
#ifndef GOLDEN_RSIZE_T_DEFINED
#define GOLDEN_RSIZE_T_DEFINED
typedef size_t rsize_t;
#endif
#endif
