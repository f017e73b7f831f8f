// libc-backed stand-in for safestringlib's safe_mem_lib.h (golden harness only).
#ifndef GOLDEN_STUB_SAFE_MEM_LIB_H
#define GOLDEN_STUB_SAFE_MEM_LIB_H
#include "safe_str_lib.h"
#endif
