"""grm driver.

Accepts the reference's exact command line (scripts/run-cpu.sh:53):
  grm --maf 0.01 --pgen X.pgen --pvar X.pvar --psam X.psam \
      --make-grm-bin --out O --threads 1
plus the plink1 `--bfile <prefix>` input used by earlier fixtures.

Mirrors plink2 --make-grm-bin (benchmarks/grm/2.0, CalcGrm at
plink2_matrix_calc.cc:3938): centered/variance-standardized genotypes,
GRM = Z^T Z per nonmissing pair, written as .grm.bin/.grm.N.bin/.grm.id.
--maf drops variants whose nonmajor allele frequency is below the
threshold (plink2_filter.cc EnforceFreqConstraints semantics on
hardcall-derived founder frequencies).
"""

from __future__ import annotations

import argparse
import sys
import time

from ..io.plink import read_bed, read_pgen
from ..ops.grm import compute_grm, maf_filter, write_grm_bin


def main(argv=None):
    ap = argparse.ArgumentParser(prog="grm")
    ap.add_argument("--bfile")
    ap.add_argument("--pgen")
    ap.add_argument("--pvar")
    ap.add_argument("--psam")
    ap.add_argument("--maf", type=float, default=None)
    ap.add_argument("--make-grm-bin", action="store_true")
    ap.add_argument("--out", required=True)
    ap.add_argument("--threads", type=int, default=1, help="ignored")
    ap.add_argument("--block", type=int, default=512)
    args = ap.parse_args(argv)

    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()

    if args.pgen:
        geno, fam, bim = read_pgen(args.pgen, args.pvar, args.psam)
    elif args.bfile:
        geno, fam, bim = read_bed(args.bfile)
    else:
        ap.error("one of --pgen or --bfile is required")
    print(f"{len(geno)} variants, {geno.shape[1]} samples loaded")
    if args.maf is not None:
        kept = maf_filter(geno, args.maf)
        print(f"{len(geno) - int(kept.sum())} variants removed due to "
              f"allele frequency threshold(s)")
        geno = geno[kept]
    t0 = time.perf_counter()
    grm, counts = compute_grm(geno, block=args.block)
    dt = time.perf_counter() - t0
    write_grm_bin(args.out, grm, counts, fam)
    print(f"GRM written to {args.out}.grm.bin ({dt:.3f} sec kernel)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
