"""Minimal BAM reader (BGZF + BAM record parsing, no htslib dependency).

Replaces the reference's htslib input path for pileup/dbg.  Reads whole
files (region filtering happens downstream — functionally equivalent to
the reference's indexed iterators for these benchmarks' full-contig
chunked scans).

BAM spec: SAM v1 §4.  BGZF = concatenated gzip members with BSIZE extra
field; each inflates to <=64 KiB.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np

FUNMAP = 0x4
FSECONDARY = 0x100
FQCFAIL = 0x200
FDUP = 0x400
FSUPPLEMENTARY = 0x800
FREVERSE = 0x10

SEQ_NT16_STR = "=ACMGRSVTWYHKDBN"
CIGAR_OPS = "MIDNSHP=X"


def bgzf_decompress(data: bytes) -> bytes:
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("bad BGZF magic")
        xlen = struct.unpack_from("<H", data, pos + 10)[0]
        extra = data[pos + 12 : pos + 12 + xlen]
        bsize = None
        ep = 0
        while ep < len(extra):
            si1, si2, slen = extra[ep], extra[ep + 1], struct.unpack_from("<H", extra, ep + 2)[0]
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack_from("<H", extra, ep + 4)[0] + 1
            ep += 4 + slen
        if bsize is None:
            raise ValueError("not BGZF (no BC extra field)")
        cdata = data[pos + 12 + xlen : pos + bsize - 8]
        out.append(zlib.decompress(cdata, -15))
        pos += bsize
    return b"".join(out)


@dataclass
class BamRecord:
    name: str
    flag: int
    ref_id: int
    pos: int  # 0-based leftmost
    mapq: int
    cigar: list  # [(op_char, length)]
    seq_nt16: np.ndarray  # 4-bit codes per base
    qual: np.ndarray
    tags: dict

    @property
    def is_reverse(self):
        return bool(self.flag & FREVERSE)


def _parse_tags(buf: bytes) -> dict:
    tags = {}
    pos = 0
    n = len(buf)
    sizes = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}
    fmts = {"c": "<b", "C": "<B", "s": "<h", "S": "<H", "i": "<i", "I": "<I", "f": "<f"}
    while pos + 3 <= n:
        tag = buf[pos : pos + 2].decode()
        typ = chr(buf[pos + 2])
        pos += 3
        if typ in sizes:
            tags[tag] = struct.unpack_from(fmts[typ], buf, pos)[0]
            pos += sizes[typ]
        elif typ == "A":
            tags[tag] = chr(buf[pos])
            pos += 1
        elif typ in ("Z", "H"):
            end = buf.index(0, pos)
            tags[tag] = buf[pos:end].decode()
            pos = end + 1
        elif typ == "B":
            sub = chr(buf[pos])
            cnt = struct.unpack_from("<I", buf, pos + 1)[0]
            pos += 5
            tags[tag] = np.frombuffer(buf[pos : pos + cnt * sizes[sub]], dtype=fmts[sub][1:]).copy()
            pos += cnt * sizes[sub]
        else:
            raise ValueError(f"unknown tag type {typ}")
    return tags


def read_bam(path, parse_tags: bool = False):
    """Returns (references [(name, length)], list[BamRecord]).

    Uses the native C++ BGZF+BAM parser (native/bamio.cpp) when built and
    tags aren't needed; falls back to the pure-Python path."""
    if not parse_tags:
        from .native import read_bam_native

        nat = read_bam_native(path)
        if nat is not None:
            refs, cols = nat
            records = []
            no, co, so = cols["name_off"], cols["cigar_off"], cols["seq_off"]
            names, cig, seq, qual = (
                cols["names"], cols["cigar"], cols["seq_nt16"], cols["qual"])
            for i in range(len(cols["ref_id"])):
                cw = cig[co[i]:co[i + 1]]
                records.append(BamRecord(
                    names[no[i]:no[i + 1]].decode(),
                    int(cols["flag"][i]),
                    int(cols["ref_id"][i]),
                    int(cols["pos"][i]),
                    int(cols["mapq"][i]),
                    [(CIGAR_OPS[c & 0xF], int(c >> 4)) for c in cw],
                    seq[so[i]:so[i + 1]],
                    qual[so[i]:so[i + 1]],
                    {},
                ))
            return refs, records
    with open(path, "rb") as f:
        raw = f.read()
    data = bgzf_decompress(raw)
    assert data[:4] == b"BAM\x01", "bad BAM magic"
    pos = 4
    l_text = struct.unpack_from("<i", data, pos)[0]
    pos += 4 + l_text
    n_ref = struct.unpack_from("<i", data, pos)[0]
    pos += 4
    refs = []
    for _ in range(n_ref):
        l_name = struct.unpack_from("<i", data, pos)[0]
        name = data[pos + 4 : pos + 4 + l_name - 1].decode()
        l_ref = struct.unpack_from("<i", data, pos + 4 + l_name)[0]
        refs.append((name, l_ref))
        pos += 8 + l_name

    records = []
    n = len(data)
    while pos + 4 <= n:
        block_size = struct.unpack_from("<i", data, pos)[0]
        start = pos + 4
        (
            ref_id,
            p0,
            l_read_name,
            mapq,
            _bin,
            n_cigar,
            flag,
            l_seq,
            _next_ref,
            _next_pos,
            _tlen,
        ) = struct.unpack_from("<iiBBHHHiiii", data, start)
        off = start + 32
        name = data[off : off + l_read_name - 1].decode()
        off += l_read_name
        cig_raw = np.frombuffer(data[off : off + 4 * n_cigar], dtype="<u4")
        cigar = [(CIGAR_OPS[c & 0xF], int(c >> 4)) for c in cig_raw]
        off += 4 * n_cigar
        nbytes = (l_seq + 1) // 2
        seq_packed = np.frombuffer(data[off : off + nbytes], dtype=np.uint8)
        seq = np.empty(l_seq, dtype=np.uint8)
        seq[0::2] = seq_packed[: (l_seq + 1) // 2] >> 4
        if l_seq > 1:
            seq[1::2] = seq_packed[: l_seq // 2] & 0xF
        off += nbytes
        qual = np.frombuffer(data[off : off + l_seq], dtype=np.uint8).copy()
        off += l_seq
        tags = _parse_tags(data[off : pos + 4 + block_size]) if parse_tags else {}
        records.append(
            BamRecord(name, flag, ref_id, p0, mapq, cigar, seq, qual, tags)
        )
        pos = start + block_size
    return refs, records


def bgzf_compress(data: bytes) -> bytes:
    """Minimal BGZF writer (single-member-per-64K blocks + EOF block)."""
    out = []
    for i in range(0, max(len(data), 1), 65000):
        chunk = data[i : i + 65000]
        comp = zlib.compress(chunk, 6)[2:-4]  # raw deflate
        crc = zlib.crc32(chunk) & 0xFFFFFFFF
        bsize = len(comp) + 25 + 1
        out.append(
            b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
            + struct.pack("<H", 6)
            + b"BC"
            + struct.pack("<H", 2)
            + struct.pack("<H", bsize - 1)
            + comp
            + struct.pack("<II", crc, len(chunk))
        )
    # EOF marker block
    out.append(
        bytes.fromhex(
            "1f8b08040000000000ff0600424302001b0003000000000000000000"
        )
    )
    return b"".join(out)


def _encode_tag(tag: str, val) -> bytes:
    """SAM aux tag encoding (subset: i, f, Z, A, and B numeric arrays)."""
    head = tag.encode()
    if isinstance(val, str):
        if len(val) == 1:
            return head + b"A" + val.encode()
        return head + b"Z" + val.encode() + b"\x00"
    if isinstance(val, (int, np.integer)):
        return head + b"i" + struct.pack("<i", int(val))
    if isinstance(val, (float, np.floating)):
        return head + b"f" + struct.pack("<f", float(val))
    arr = np.asarray(val)
    sub = {"int8": b"c", "uint8": b"C", "int16": b"s", "uint16": b"S",
           "int32": b"i", "uint32": b"I", "float32": b"f"}.get(str(arr.dtype))
    if sub is None:
        arr = arr.astype(np.float32)
        sub = b"f"
    return head + b"B" + sub + struct.pack("<I", len(arr)) + arr.tobytes()


def write_bam(path, refs, records):
    """Minimal BAM writer for tests/fixtures (incl. aux tags)."""
    body = [b"BAM\x01", struct.pack("<i", 0), struct.pack("<i", len(refs))]
    for name, length in refs:
        nb = name.encode() + b"\x00"
        body.append(struct.pack("<i", len(nb)) + nb + struct.pack("<i", length))
    op_idx = {c: i for i, c in enumerate(CIGAR_OPS)}
    nt16_idx = {c: i for i, c in enumerate(SEQ_NT16_STR)}
    for r in records:
        nb = r.name.encode() + b"\x00"
        cig = b"".join(
            struct.pack("<I", (length << 4) | op_idx[op]) for op, length in r.cigar
        )
        l_seq = len(r.seq_nt16)
        packed = bytearray((l_seq + 1) // 2)
        for i, c in enumerate(r.seq_nt16):
            if i % 2 == 0:
                packed[i // 2] |= int(c) << 4
            else:
                packed[i // 2] |= int(c)
        rec = struct.pack(
            "<iiBBHHHiiii",
            r.ref_id,
            r.pos,
            len(nb),
            r.mapq,
            0,
            len(r.cigar),
            r.flag,
            l_seq,
            -1,
            -1,
            0,
        )
        rec += nb + cig + bytes(packed) + bytes(r.qual.astype(np.uint8))
        for tag, val in (r.tags or {}).items():
            rec += _encode_tag(tag, val)
        body.append(struct.pack("<i", len(rec)) + rec)
    with open(path, "wb") as f:
        f.write(bgzf_compress(b"".join(body)))
