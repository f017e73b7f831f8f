"""Phase breakdown of the lane-packed chain path on the real dataset.

Times route/pack/ship/kernel/fetch/unpack inside chain_calls_packed
(plus parse + prepare_call outside it) for the 1001-call dataset, to
show where dataset-scale wall time goes — the PERF.md chain roofline
companion (VERDICT r2 stretch item 9).

Usage: python tools/chain_phase_probe.py [--workdir /tmp/chain_scale]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/chain_scale")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args(argv)

    from genomicsbench_palisade_tpu.utils.compile_cache import enable
    enable()
    from genomicsbench_palisade_tpu.io.chain_dump import parse_chain_dump
    from genomicsbench_palisade_tpu.ops import chain as C

    dump = pathlib.Path(args.workdir) / "calls.txt"
    t0 = time.perf_counter()
    calls = parse_chain_dump(str(dump))
    parse_s = time.perf_counter() - t0
    total = int(sum(c.n for c in calls))

    t0 = time.perf_counter()
    preps = [C.prepare_call(c.x, c.y, c.avg_qspan, c.max_dist_x,
                            c.max_dist_y, c.bw) for c in calls if c.n > 0]
    prepare_s = time.perf_counter() - t0

    out = {"tool": "chain_phase_probe", "calls": len(calls),
           "total_anchors": total, "parse_s": round(parse_s, 2),
           "prepare_s": round(prepare_s, 2)}
    for p in range(args.passes):
        tm = {}
        t0 = time.perf_counter()
        res = C.chain_calls_packed(preps, timings=tm)
        wall = time.perf_counter() - t0
        out[f"pass{p}"] = {k: round(v, 2) for k, v in tm.items()}
        out[f"pass{p}"]["wall_s"] = round(wall, 2)
        out[f"pass{p}"]["anchors_per_s"] = round(total / wall, 1)
    out["route"] = dict(C.LAST_ROUTE)
    del res
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
