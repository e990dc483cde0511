#!/usr/bin/env python3
"""External-consumer smoke reader for the persisted-HNSW export contract
(schema_version 1 — see graft.operators.Hnsw.PersistedNode and
HnswExportContractSpec). Proves the on-disk parquet is consumable by a
NON-JVM serving engine: loads the flat node table with pyarrow only,
restores one graph per `part`, runs the same greedy-descent + beam search
the engine runs (including the saturating-beam orphan sweep), and merges
per-part top-k — byte-for-byte the engine's searchPersisted answer
(asserted by HnswExportContractSpec's reader-parity test).

Usage: hnsw_reader.py <parquet_dir_or_file> <k> <ef> <q0,q1,...>
       ef <= 0 saturates (exact per part, the engine's sentinel).
Prints one "vec_id,score" line per hit (score = floor(sqrt(l2^2)*1e4+0.5)).
"""
import sys, glob, os, heapq, math
import pyarrow.parquet as pq
import numpy as np

SCHEMA_VERSION = 1


def load_parts(path):
    files = [path] if os.path.isfile(path) else \
        sorted(glob.glob(os.path.join(path, "*.parquet")))
    cols = ["part", "node", "ext_id", "vec", "level", "links", "ep", "top",
            "schema_version"]
    parts = {}
    for f in files:
        t = pq.read_table(f, columns=cols).to_pydict()
        for i in range(len(t["part"])):
            if t["schema_version"][i] != SCHEMA_VERSION:
                raise SystemExit(
                    f"schema_version {t['schema_version'][i]} != reader's "
                    f"{SCHEMA_VERSION}: rebuild the index or update the reader")
            p = parts.setdefault(t["part"][i], {"rows": []})
            p["rows"].append((t["node"][i], t["ext_id"][i], t["vec"][i],
                              t["level"][i], t["links"][i],
                              t["ep"][i], t["top"][i]))
    for p in parts.values():
        rows = sorted(p["rows"])                      # dense node order
        assert [r[0] for r in rows] == list(range(len(rows))), \
            "contract violation: node ids not dense 0..n-1 within part"
        p["ext"] = [r[1] for r in rows]
        # vectors arrive float32; compute in float64 exactly like the JVM
        p["vecs"] = [[float(x) for x in r[2]] for r in rows]
        p["levels"] = [r[3] for r in rows]
        p["links"] = [r[4] for r in rows]
        p["ep"], p["top"] = rows[0][5], rows[0][6]
        del p["rows"]
    return parts


def sq(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        d = x - y
        acc += d * d
    return acc


def search_layer(p, q, ep, ef, level):
    """Beam search one layer — mirrors Hnsw.Graph.searchLayer: candidates
    nearest-first, results farthest-first bounded to ef, (d, node) ties."""
    visited = {ep}
    d0 = sq(q, p["vecs"][ep])
    cands = [(d0, ep)]                       # min-heap on (d, node)
    results = [(-d0, -ep)]                   # max-heap via negation
    while cands:
        cd, c = heapq.heappop(cands)
        if cd > -results[0][0] and len(results) >= ef:
            break
        nbrs = p["links"][c][level] if level < len(p["links"][c]) else []
        for n in nbrs:
            if n not in visited:
                visited.add(n)
                d = sq(q, p["vecs"][n])
                if len(results) < ef or d < -results[0][0]:
                    heapq.heappush(cands, (d, n))
                    heapq.heappush(results, (-d, -n))
                    if len(results) > ef:
                        heapq.heappop(results)
    return sorted((-d, -n) for d, n in results)


def search_part(p, q, k, ef):
    if p["ep"] < 0 or not p["vecs"]:
        return []
    eff = max(ef, k) if ef > 0 else len(p["vecs"])
    # greedy descent through layers above 0
    ep = p["ep"]
    for l in range(p["top"], 0, -1):
        changed, best = True, sq(q, p["vecs"][ep])
        while changed:
            changed = False
            nbrs = p["links"][ep][l] if l < len(p["links"][ep]) else []
            for n in nbrs:
                d = sq(q, p["vecs"][n])
                if d < best:
                    best, ep, changed = d, n, True
    beam = search_layer(p, q, ep, eff, 0)
    # saturating-beam orphan sweep (exactness contract: a one-sided degree
    # prune can strand a node with no in-edges)
    if eff >= len(p["vecs"]) and len(beam) < len(p["vecs"]):
        seen = {n for _, n in beam}
        beam += [(sq(q, p["vecs"][n]), n) for n in range(len(p["vecs"]))
                 if n not in seen]
    hits = [(p["ext"][n], int(math.floor(math.sqrt(d) * 10000.0 + 0.5)))
            for d, n in beam]
    return sorted(hits, key=lambda t: (t[1], t[0]))[:k]


def main():
    path, k, ef = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    # queries quantize through float32 first — the engine's query is a
    # float[] and both sides must widen the SAME 32-bit value to double
    q = [float(np.float32(x)) for x in sys.argv[4].split(",")]
    merged = []
    for p in load_parts(path).values():
        merged += search_part(p, q, k, ef)
    for ext_id, score in sorted(merged, key=lambda t: (t[1], t[0]))[:k]:
        print(f"{ext_id},{score}")


if __name__ == "__main__":
    main()
