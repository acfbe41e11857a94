#!/usr/bin/env python3
"""Regenerate COVERAGE.md's quoted figures from generated artifacts.

The round-8/9/10/11 reviews all caught the same staleness class: a
hand-typed number in COVERAGE.md drifting from the artifact that
actually holds it. Every quoted figure now lives between marker
comments and is written ONLY by this script — run it after the last
`graft.Verify` + `graft.Bench` of a round:

- ``<!-- bench:begin -->``/``<!-- bench:end -->`` — from
  BENCH_LOCAL.json (written by the full `graft.Bench`; deliberately NOT
  written by BENCH_ONLY subset runs).
- ``<!-- counts:begin -->``/``<!-- counts:end -->`` — registry totals
  from COUNTS.json (written by every `graft.Verify` run), the canary
  set size from CANARY.json, and the scaling-net sizes from SCALING.md's
  generated tables.
"""
import json
import pathlib
import re

root = pathlib.Path(__file__).resolve().parent.parent
path = root / "COVERAGE.md"
txt = path.read_text()


def replace(marker: str, new: str, txt: str) -> str:
    out, n = re.subn(
        rf"<!-- {marker}:begin -->.*?<!-- {marker}:end -->",
        f"<!-- {marker}:begin -->{new}<!-- {marker}:end -->",
        txt,
        flags=re.S,
    )
    assert n == 1, f"{marker} markers missing or duplicated in COVERAGE.md"
    return out


# --- bench line (from the last full graft.Bench) ---
bench = json.loads((root / "BENCH_LOCAL.json").read_text())
total = bench["value"]
queries = {k: v for k, v in bench["queries"].items() if v >= 0}
sf = bench["sf"].rstrip("/").split("/")[-1]
worst_name, worst_t = max(queries.items(), key=lambda kv: kv[1])
bench_line = (
    f"bench total {total:.2f} s over {len(queries)} registered queries "
    f"at {sf} on local[32]; heaviest single query {worst_name} at "
    f"{worst_t:.2f} s"
)
txt = replace("bench", bench_line, txt)

# --- status counts (from graft.Verify's COUNTS.json + the other
#     generated artifacts) ---
counts = json.loads((root / "COUNTS.json").read_text())
registered, oracled = counts["registered"], counts["oracled"]
canary = json.loads((root / "CANARY.json").read_text())
n_canary = len(canary["queries"])
scaling = (root / "SCALING.md").read_text()
# generated tables: the main 1x/10x net and the spot-check table are the
# only pipe tables; count body rows (skip header + separator) by their
# distinct column counts
main_rows = len(re.findall(r"(?m)^\| \S+ \| [\d.]+ \| [\d.]+ \| [\d.]+× \|", scaling))
spot_rows = len(
    re.findall(r"(?m)^\| \S+ \| [\d.]+ \| [\d.]+ \| [\d.]+ \| [\d.]+× \|", scaling)
)
non_oracled = (
    "zero non-oracled rows — since round 13 even the approx sketches are "
    "oracled bound-verdict queries"
    if registered == oracled
    else f"the {registered - oracled} non-oracled rows are the by-design "
    "approx sketches, error-bounded against their exact oracled twins in "
    "OpsSpec"
)
counts_line = (
    f"Status: {oracled} of {registered} registered queries carry a full DuckDB "
    f"oracle and hash-match at sf0.01 AND sf0.1 ({non_oracled}); "
    f"the fresh-JVM canary "
    f"gate pins {n_canary} queries (CANARY.json); SCALING.md measures "
    f"{main_rows} queries at 1× vs 10× plus {spot_rows} at a 30× third point"
)
txt = replace("counts", counts_line, txt)

path.write_text(txt)
print(bench_line)
print(counts_line)
