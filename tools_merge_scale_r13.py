"""Merge round-13 scale sessions into SCALE_BENCH_r13.json.

Inputs:
- SCALE_BENCH_r12.json           (cumulative carry-forward, r12 discipline)
- SCALE_BENCH_r13_mog.json       (MoG IVF session, 24g)
- SCALE_BENCH_r13_graph64.json   (graph x300+x1000 session, 64g)
- the 24g graph session that OOM'd during its cadence=2 study
  before main() could write its JSON: its query cells are recovered
  from the session log verbatim (best-of-3 values printed per cell)
  and carry an explicit ``-logrecovered`` provenance suffix. The
  process (pid 31711, started 2026-08-16T02:08:44) printed:
    graph_x300 x92:  first=269.06s best=219.11s
    graph_x300 x100: first=56.47s  best=55.02s
    graph_x300 x107: first=107.69s best=107.69s
    graph_x300 x128: first=176.19s best=175.14s
    kcore cadence=1: ['55.25', '70.81', '54.79']
    (cadence=2 run 1 died in java.lang.OutOfMemoryError after ~15
    min — recorded as the string "oom@24g" rather than a number)
Keys: the 24g session's cells are stored under graph_x300_24g so the
64g session keeps the plain graph_x300/graph_x1000 keys (the
artifact-level driver_mem field can't describe a mixed-heap merge).
"""

import json

R = "/root/repo"
out = json.load(open(f"{R}/SCALE_BENCH_r12.json"))
out.pop("run_id", None)

LOG24 = "20260816T020844.31711-logrecovered"
run_ids = {"graph_24g_oom_session": LOG24}

q = out["queries"]
p = out["provenance"]

# 24g log-recovered graph_x300 cells
for name, best in (
    ("x92_cooccurrence_triangles", 219.11),
    ("x100_kcore_membership", 55.02),
    ("x107_pagerank_topk", 107.69),
    ("x128_clustering_coefficient", 175.14),
):
    q.setdefault(name, {})["graph_x300_24g"] = best
    p.setdefault(name, {})["graph_x300_24g"] = LOG24

diags = out.setdefault("diagnostics", {})
diags["kcore_cadence_graph_x300_24g"] = {
    "cadence_1": 54.79,
    "cadence_1_runs": [55.25, 70.81, 54.79],
    "cadence_2": "oom@24g",
    "provenance": LOG24,
}

for fname, tag in (
    ("SCALE_BENCH_r13_mog.json", "mog"),
    ("SCALE_BENCH_r13_graph64.json", "graph64"),
):
    d = json.load(open(f"{R}/{fname}"))
    run_ids[tag] = d["run_id"]
    run_ids[f"{tag}_driver_mem"] = d.get("driver_mem", "24g")
    for name, cells in d["queries"].items():
        q.setdefault(name, {}).update(cells)
        p.setdefault(name, {}).update(d["provenance"].get(name, {}))
    for k, v in d.get("diagnostics", {}).items():
        diags[k] = v

out["run_ids_r13"] = run_ids
with open(f"{R}/SCALE_BENCH_r13.json", "w") as fh:
    json.dump(out, fh, indent=1, sort_keys=True)
    fh.write("\n")
print("merged:", {k: run_ids[k] for k in run_ids})
