"""Planted-query recall gate for the IVF-PQ path at an arbitrary scale
factor (VERDICT r13 item 1: the corpus-scaled quantizer + nprobe-tracks-
nlist rule were proven at driver SFs where nlist == 8; at sf10 nlist
finally GROWS, and the constant-scanned-fraction argument for recall
needs a measurement in that regime, not an extrapolation).

Same planted construction as tests/test_ann.py: each query is a
normalized mixture 0.97·x_i + 0.10·x_j of two corpus vectors, a genuine
near neighbor (cos ≥ ~0.95) of its dominant parent — what an ANN index
is FOR. Recall@k = fraction of planted queries whose parent appears in
the pq_topk result. Prints one JSON line.

Usage: python tools/check_pq_recall.py --sf-dir /tmp/oxbow_scale/sf10
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--n-queries", type=int, default=25)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    import numpy as np
    import pyarrow.parquet as pq

    from oxbow_spark.operators import similarity as S
    from oxbow_spark.queries import registry
    from oxbow_spark.session import get_spark

    spark = get_spark("pq_recall", cpus=args.cpus,
                      shuffle_partitions=args.cpus)
    emb_path = os.path.join(args.sf_dir, "embeddings.parquet")
    emb = spark.read.parquet(emb_path)

    # planted queries: mixtures of two corpus vectors (parent = dominant).
    # Sample-bounded (VERDICT r14 "what's wrong" #4): plant from a few
    # RANDOM ROW GROUPS instead of to_pylist() on the whole table — the
    # full materialization was ~100 MB of driver lists at sf10 and ~1 GB
    # at sf100, for 25 queries. Row groups are chosen by a seeded
    # permutation so parents stay corpus-spread; recall semantics are
    # unchanged (queries are planted near real corpus vectors and
    # pq_topk searches the FULL corpus).
    # single-file layout (the driver's) or a gen_sf --multifile
    # directory: either way, sample whole row groups.
    if os.path.isdir(emb_path):
        import glob
        files = sorted(glob.glob(os.path.join(emb_path, "*.parquet")))
    else:
        files = [emb_path]
    pfs = [pq.ParquetFile(p) for p in files]
    n_total = sum(pf.metadata.num_rows for pf in pfs)
    rgs = [(fi, g) for fi, pf in enumerate(pfs)
           for g in range(pf.metadata.num_row_groups)]
    need = args.n_queries + 102  # parents + the +101 mixture partners
    rng = np.random.default_rng(42)
    X_parts, id_parts, got_rows = [], [], 0
    for pick in rng.permutation(len(rgs)):
        fi, rg = rgs[int(pick)]
        t = pfs[fi].read_row_group(rg, columns=["vec_id", "embedding"])
        col = t.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        X_parts.append(np.asarray(flat, dtype=np.float64).reshape(
            len(col), -1))
        id_parts.append(t.column("vec_id").to_numpy())
        got_rows += t.num_rows
        if got_rows >= need:
            break
    X = np.concatenate(X_parts)
    ids = np.concatenate(id_parts)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    rows = []
    step = max(1, len(ids) // args.n_queries)  # parents spread sample-wide
    for qi in range(args.n_queries):
        i, j = (qi * step) % len(ids), (qi * step + 101) % len(ids)
        v = 0.97 * Xn[i] + 0.10 * Xn[j]
        v = v / np.linalg.norm(v)
        rows.append((int(1_000_000 + qi), [float(x) for x in v],
                     int(ids[i])))
    q = spark.createDataFrame(
        rows, "query_id long, embedding array<float>, parent_id long")
    truth = {r[0]: r[2] for r in rows}

    # the exact models + knobs the sim_topk_pq bench row uses
    t0 = time.perf_counter()
    cb, cents, nlist = registry._pq_models(spark, args.sf_dir)
    fit_s = time.perf_counter() - t0
    nprobe = max(registry._IVF_NPROBE,
                 nlist * registry._IVF_NPROBE // registry._IVF_NLIST)
    t0 = time.perf_counter()
    res = S.pq_topk(emb, q.select("query_id", "embedding"), cb,
                    k=args.k, refine=8, centroids=cents, nprobe=nprobe)
    got = {(r.query_id, r.neighbor_id) for r in res.collect()}
    scan_s = time.perf_counter() - t0
    recall = sum(1 for qid, pid in truth.items()
                 if (qid, pid) in got) / len(truth)

    print(json.dumps({
        "sf_dir": args.sf_dir,
        "n_embeddings": int(n_total),
        "n_sampled_for_planting": int(len(ids)),
        "nlist": int(nlist),
        "nprobe": int(nprobe),
        "scanned_fraction": round(nprobe / nlist, 4),
        "k": args.k,
        "n_queries": args.n_queries,
        "recall_at_k": round(recall, 4),
        "fit_sec": round(fit_s, 2),
        "scan_sec": round(scan_s, 2),
        "loadavg": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
