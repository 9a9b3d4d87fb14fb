"""Exec-only 10x scale sweep of the dedup/text tier (VERDICT r12 item 8).

The r9 hang class (O(words^2) lambda re-evaluation) was found by SCALE,
not by hash mismatches — so this sweep re-proves the hang-proof shapes
one order of magnitude up, on BOTH scale axes at once:

* VOLUME — documents/embeddings replicated 10x (sf1-equivalent row
  counts: 50k docs / 20k vectors from sf0.1's 5k/2k), clone ids offset
  by k*50,000,000 (clear of the entries' _PLANT_OFFSET 10M planting and
  the dup corpus's 20M clone offset).  Clones are byte-identical to
  their source docs — deliberately dup-heavy, so the blocked-index
  candidate generation sees 10x-denser buckets and the _DF_CAP
  hot-bucket guards are exercised at pressure, not just stated.
* DOCUMENT SIZE — the 8 long-corpus shapes (make_degenerate._long_text:
  rep / uniq / giant / mixed) rewritten at 10x their long-corpus size
  (~1-2.5 MB per doc, giant = a single ~1 MB token) onto 8 of the
  clone-0 documents, the exact axis that found the r9 executor hang.

Every entry in pipeline.dedup.QUERIES and pipeline.text.QUERIES runs
exec-only (noop sink, no oracle) at sf0.1 FIRST (JIT warm-up + the
comparison base), then on the 10x corpus.  Output: one JSON line per
entry {"entry", "sf01_sec", "x10_sec", "ratio"} and a final summary
line with the worst ratios.  The ledger criterion: no entry more than
10x its same-session sf0.1 wall time (linear-or-better scaling); any
excess is reported at observed strength with the suspected cause.

Usage: python tools/scale10_sweep.py [sf_dir=/root/testdata/sf0.1]
                                     [out_dir=/tmp/spark_graft_scale10]
                                     [--resume path.jsonl]

--resume skips entries already recorded in the given jsonl (one
{"entry": ...} record per line) — the sweep stops mid-run when it FINDS
a quadratic entry (that is its job), gets the fix, and resumes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from make_degenerate import _LONG_N, _long_text  # noqa: E402  (tools dir)

_CLONE_OFFSET = 50_000_000
_CLONES = 10
_SIZE_MULT = 10


def build_corpus(sf_dir: str, out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for f in sorted(os.listdir(sf_dir)):
        if not f.endswith(".parquet"):
            continue
        src = os.path.join(sf_dir, f)
        dst = os.path.join(out_dir, f)
        name = f[: -len(".parquet")]
        if name not in ("documents", "embeddings"):
            shutil.copyfile(src, dst)
            continue
        t = pq.read_table(src)
        idcol = "doc_id" if name == "documents" else "vec_id"
        parts = []
        for k in range(_CLONES):
            c = t.set_column(
                t.schema.get_field_index(idcol),
                t.schema.field(idcol),
                pa.compute.add(t.column(idcol), k * _CLONE_OFFSET),
            )
            parts.append(c)
        big = pa.concat_tables(parts)
        if name == "documents":
            # 10x-size long shapes onto the first _LONG_N clone-0 docs
            texts = big.column("text").to_pylist()
            nchars = big.column("n_chars").to_pylist()
            for rank in range(_LONG_N):
                texts[rank] = _long_text(rank % 4, rank) * _SIZE_MULT
                nchars[rank] = len(texts[rank])
            ti = big.schema.get_field_index("text")
            big = big.set_column(
                ti, big.schema.field(ti), pa.array(texts, type=pa.string())
            )
            ni = big.schema.get_field_index("n_chars")
            big = big.set_column(
                ni,
                big.schema.field(ni),
                pa.array(nchars, type=big.schema.field(ni).type),
            )
        pq.write_table(big, dst)
    print(json.dumps({"built": out_dir, "clones": _CLONES,
                      "long_docs": _LONG_N, "size_mult": _SIZE_MULT}))


def main() -> None:
    argv = sys.argv[1:]
    done: set[str] = set()
    if "--resume" in argv:
        i = argv.index("--resume")
        resume_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
        with open(resume_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if isinstance(rec, dict) and "entry" in rec:
                    done.add(rec["entry"])
        print(json.dumps({"resumed": len(done)}))
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    out_dir = argv[1] if len(argv) > 1 else "/tmp/spark_graft_scale10"
    build_corpus(sf_dir, out_dir)

    from datafusion_test_spark.pipeline import (
        curation,
        dedup,
        multimodal,
        prep,
        quality,
        similarity,
        text,
    )
    from datafusion_test_spark.session import get_session

    spark = get_session("scale10-sweep")
    # every module whose entries read the scaled documents/embeddings
    # tables (evals/ops over the unscaled events table are skipped —
    # their x10 leg would measure nothing)
    entries = {
        **dedup.QUERIES, **text.QUERIES, **quality.QUERIES,
        **curation.QUERIES, **prep.QUERIES, **similarity.QUERIES,
        **multimodal.QUERIES,
    }

    def run(fn, d) -> float:
        t0 = time.perf_counter()
        fn(spark, d).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    results = []
    for name, fn in sorted(entries.items()):
        if name in done:
            continue
        s01 = run(fn, sf_dir)
        x10 = run(fn, out_dir)
        ratio = round(x10 / s01, 2) if s01 > 0 else None
        rec = {"entry": name, "sf01_sec": s01, "x10_sec": x10, "ratio": ratio}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    worst = sorted(results, key=lambda r: -(r["ratio"] or 0))[:5]
    print(json.dumps({
        "n_entries": len(results),
        "over_10x": [r["entry"] for r in results if (r["ratio"] or 0) > 10],
        "worst5": worst,
        "total_x10_sec": round(sum(r["x10_sec"] for r in results), 1),
    }))


if __name__ == "__main__":
    main()
