#!/usr/bin/env python3
"""Regenerate COVERAGE.md's quoted bench figures from BENCH_LOCAL.json.

The round-8 and round-9 reviews both caught the same staleness class: a
hand-typed bench total in COVERAGE.md drifting from the number actually
sitting in BENCH_LOCAL.json. The quoted figures now live between
``<!-- bench:begin -->``/``<!-- bench:end -->`` markers and are written
ONLY by this script — run it after the last `graft.Bench` of a round.
"""
import json
import pathlib
import re

root = pathlib.Path(__file__).resolve().parent.parent
bench = json.loads((root / "BENCH_LOCAL.json").read_text())
total = bench["value"]
queries = {k: v for k, v in bench["queries"].items() if v >= 0}
sf = bench["sf"].rstrip("/").split("/")[-1]
worst_name, worst_t = max(queries.items(), key=lambda kv: kv[1])

new = (
    f"bench total {total:.2f} s over {len(queries)} registered queries "
    f"at {sf} on local[32]; heaviest single query {worst_name} at "
    f"{worst_t:.2f} s"
)
path = root / "COVERAGE.md"
txt = path.read_text()
out, n = re.subn(
    r"<!-- bench:begin -->.*?<!-- bench:end -->",
    f"<!-- bench:begin -->{new}<!-- bench:end -->",
    txt,
    flags=re.S,
)
assert n == 1, "bench markers missing or duplicated in COVERAGE.md"
path.write_text(out)
print(new)
