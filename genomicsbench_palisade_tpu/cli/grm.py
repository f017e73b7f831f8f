"""grm driver: `python -m genomicsbench_palisade_tpu.cli.grm --bfile <prefix> --make-grm-bin --out <o>`.

Mirrors plink2 --make-grm-bin (benchmarks/grm/2.0, CalcGrm at
plink2_matrix_calc.cc:3938): centered/variance-standardized genotypes,
GRM = Z^T Z per nonmissing pair, written as .grm.bin/.grm.N.bin/.grm.id.
"""

from __future__ import annotations

import argparse
import sys
import time

from ..io.plink import read_bed
from ..ops.grm import compute_grm, write_grm_bin


def main(argv=None):
    ap = argparse.ArgumentParser(prog="grm")
    ap.add_argument("--bfile", required=True)
    ap.add_argument("--make-grm-bin", action="store_true")
    ap.add_argument("--out", required=True)
    ap.add_argument("--block", type=int, default=512)
    args = ap.parse_args(argv)

    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()

    geno, fam, bim = read_bed(args.bfile)
    print(f"{len(bim)} variants, {len(fam)} samples loaded")
    t0 = time.perf_counter()
    grm, counts = compute_grm(geno, block=args.block)
    dt = time.perf_counter() - t0
    write_grm_bin(args.out, grm, counts, fam)
    print(f"GRM written to {args.out}.grm.bin ({dt:.3f} sec kernel)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
