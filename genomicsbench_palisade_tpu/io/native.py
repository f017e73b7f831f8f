"""ctypes bindings for the native host-I/O library (native/fastio.cpp).

Falls back transparently to the pure-Python readers when the .so hasn't
been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import pathlib

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = pathlib.Path(__file__).resolve().parents[2] / "native" / "libgenomics_native.so"
    if not so.exists():
        _LIB = False
        return _LIB
    lib = ctypes.CDLL(str(so))
    lib.gt_parse_reads.restype = ctypes.c_void_p
    lib.gt_parse_reads.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.gt_num_reads.restype = ctypes.c_int64
    lib.gt_num_reads.argtypes = [ctypes.c_void_p]
    lib.gt_total_bases.restype = ctypes.c_int64
    lib.gt_total_bases.argtypes = [ctypes.c_void_p]
    lib.gt_num_quals.restype = ctypes.c_int64
    lib.gt_num_quals.argtypes = [ctypes.c_void_p]
    lib.gt_copy_out.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
    lib.gt_free_reads.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return bool(_load())


def parse_reads_native(path: str, limit: int = -1):
    """Returns (codes int8[total], quals int8[total]|None, offsets i64[N],
    lengths i32[N]) or None if the native library isn't built."""
    lib = _load()
    if not lib:
        return None
    h = lib.gt_parse_reads(os.fsencode(path), limit)
    if not h:
        return None
    try:
        n = lib.gt_num_reads(h)
        total = lib.gt_total_bases(h)
        nq = lib.gt_num_quals(h)
        codes = np.empty(total, np.int8)
        quals = np.empty(nq, np.int8) if nq else None
        offsets = np.empty(n, np.int64)
        lengths = np.empty(n, np.int32)
        lib.gt_copy_out(
            h,
            codes.ctypes.data_as(ctypes.c_void_p),
            quals.ctypes.data_as(ctypes.c_void_p) if nq else None,
            offsets.ctypes.data_as(ctypes.c_void_p),
            lengths.ctypes.data_as(ctypes.c_void_p),
        )
    finally:
        lib.gt_free_reads(h)
    return codes, quals, offsets, lengths


def sais(codes: np.ndarray) -> np.ndarray | None:
    """Suffix array of int8/uint8 codes in [0, 255) via native SA-IS.

    Returns int64[n], or None when the native library isn't built.
    """
    lib = _load()
    if not lib:
        return None
    if not hasattr(lib, "_sais_ready"):
        lib.gt_sais_u8.restype = ctypes.c_int
        lib.gt_sais_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib._sais_ready = True
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    shifted = codes + 1  # reserve 0 for the internal sentinel
    n = len(shifted)
    sa = np.empty(n, np.int64)
    k = int(shifted.max()) + 1 if n else 1
    rc = lib.gt_sais_u8(shifted.ctypes.data, n, k, sa.ctypes.data)
    if rc != 0:
        return None
    return sa


def read_bam_native(path: str):
    """Native BGZF+BAM parse into columnar arrays, or None if unavailable.

    Returns (refs [(name, len)], cols dict) where cols has ref_id, pos,
    mapq, flag (i32[N]); name_off/cigar_off/seq_off (i64[N+1] exclusive
    prefixes); names (bytes); cigar (u32 raw words); seq_nt16, qual (u8).
    """
    lib = _load()
    if not lib:
        return None
    if not hasattr(lib, "_bam_ready"):
        lib.gt_bam_open.restype = ctypes.c_void_p
        lib.gt_bam_open.argtypes = [ctypes.c_char_p]
        for fn in ("gt_bam_n_records", "gt_bam_n_refs", "gt_bam_names_bytes",
                   "gt_bam_cigar_words", "gt_bam_seq_bytes",
                   "gt_bam_refnames_bytes"):
            getattr(lib, fn).restype = ctypes.c_int64
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        lib.gt_bam_copy_refs.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 2
        lib.gt_bam_copy_out.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 11
        lib.gt_bam_free.argtypes = [ctypes.c_void_p]
        lib._bam_ready = True
    h = lib.gt_bam_open(os.fsencode(path))
    if not h:
        return None
    try:
        n = lib.gt_bam_n_records(h)
        n_refs = lib.gt_bam_n_refs(h)
        rn_bytes = lib.gt_bam_refnames_bytes(h)
        rn = ctypes.create_string_buffer(int(rn_bytes))
        rlens = np.empty(n_refs, np.int64)
        lib.gt_bam_copy_refs(h, rn, rlens.ctypes.data_as(ctypes.c_void_p))
        names_list = rn.raw.decode().split("\n")[:n_refs]
        refs = list(zip(names_list, rlens.tolist()))

        cols = {
            "ref_id": np.empty(n, np.int32),
            "pos": np.empty(n, np.int32),
            "mapq": np.empty(n, np.int32),
            "flag": np.empty(n, np.int32),
            "name_off": np.empty(n + 1, np.int64),
            "cigar_off": np.empty(n + 1, np.int64),
            "seq_off": np.empty(n + 1, np.int64),
            "cigar": np.empty(lib.gt_bam_cigar_words(h), np.uint32),
            "seq_nt16": np.empty(lib.gt_bam_seq_bytes(h), np.uint8),
            "qual": np.empty(lib.gt_bam_seq_bytes(h), np.uint8),
        }
        names_buf = ctypes.create_string_buffer(int(lib.gt_bam_names_bytes(h)))
        lib.gt_bam_copy_out(
            h,
            *(cols[k].ctypes.data_as(ctypes.c_void_p)
              for k in ("ref_id", "pos", "mapq", "flag", "name_off")),
            names_buf,
            *(cols[k].ctypes.data_as(ctypes.c_void_p)
              for k in ("cigar_off", "cigar", "seq_off", "seq_nt16", "qual")),
        )
        cols["names"] = names_buf.raw
    finally:
        lib.gt_bam_free(h)
    return refs, cols
