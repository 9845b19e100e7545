"""Engine-only scale sweep: run EVERY registered query at a scale dir and
flag stragglers — the generalization of the sf5 finding that caught
q_hard_negative_mining_ann's mega-bucket stall (SCALE.md round 4).

No oracle here (that's test_scale_parity's job on the bounded family);
this answers a different question: does any of the 690 declared plans hit
a wall-clock cliff when the data grows 50×? Each query gets a watchdog
budget; on expiry its Spark jobs are cancelled via job-group and the query
is recorded as OVER_BUDGET rather than hanging the sweep.

    python tools_scale_sweep.py [sf_dir] [budget_sec] [name_filter...]
    python tools_scale_sweep.py sf_dir budget --shard K M   # names[K::M]

Output: one JSON line per query (name, status, wall, rows), then a summary
line; exit 1 if any non-quarantined query went over budget or errored.
Known-quadratic recall oracles (documented quarantine, SCALE.md) are
SKIPPED by default at scale — their cancelled tasks outlive
cancelJobGroup (pandas-UDF/hash-agg tasks don't observe the interrupt)
and the zombies OOMed the shared JVM on the first sf5 run. Sweep one
explicitly (own process) by passing its name as a filter.
"""

from __future__ import annotations

import json
import sys
import threading
import time

# Documented scale-quarantined queries: correct by design, quadratic by
# ground truth (they are the recall oracles for their ANN/LSH twins).
QUARANTINE = {
    "q_knn_bruteforce",
    "q_dedup_embedding_cosine",
    "q_hard_negative_mining",
    "q_dedup_jaccard_pairs",
    "q_dedup_minhash_lsh",
    # leave-one-out O(n²) eval by design; registered scale twin:
    # q_knn_classifier_eval_sampled (extras175, swept ok at sf5)
    "q_knn_classifier_eval",
    # banding diagnostic: candidate-pair volume is quadratic on this
    # corpus's ground truth (31-token vocabulary ⇒ ~6% true near-dups),
    # same reality as the quarantined pair emitters
    "q_lsh_band_sweep",
    # leave-one-out all-pairs MRR baseline; registered scale twin:
    # q_retrieval_mrr_ann (extras175, swept ok at sf5 — LSH candidates,
    # scoring tail unchanged)
    "q_retrieval_mrr",
    # token-keyed pair join is Σ df(token)² — quadratic on this corpus's
    # saturated token distribution; registered scale twin:
    # q_tfidf_cosine_pairs_capped (extras175, swept ok at sf5 — df-cap
    # stopword guard over the diagnostic doc sample)
    "q_tfidf_cosine_pairs",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "scale_data/sf5"
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    rest = sys.argv[3:]
    shard = None
    done: set[str] = set()
    while rest and rest[0] in ("--shard", "--resume"):
        if rest[0] == "--shard":
            shard = (int(rest[1]), int(rest[2]))
            rest = rest[3:]
        else:  # --resume FILE: skip names already recorded there
            try:
                with open(rest[1]) as fh:
                    for line in fh:
                        try:
                            done.add(json.loads(line)["name"])
                        except (ValueError, KeyError):
                            pass
            except OSError:
                pass
            rest = rest[2:]
    name_filter = rest

    import __spark_entry__ as entry
    from watermill_spark.session import get_spark

    spark = get_spark("scale-sweep")
    sc = spark.sparkContext
    queries = entry.queries()
    names = [
        n for n in sorted(queries)
        if not name_filter or any(f in n for f in name_filter)
    ]
    if shard is not None:
        names = names[shard[0]::shard[1]]
    names = [n for n in names if n not in done]

    results = []
    for i, name in enumerate(names):
        # Quadratic-by-ground-truth recall oracles are SKIPPED at scale,
        # not watchdogged: their cancelled tasks do not die promptly
        # (pandas-UDF / huge hash-agg tasks outlive cancelJobGroup), and
        # the zombies' held buffers OOMed the shared JVM mid-sweep on the
        # first sf5 run — poisoning every later query with
        # ConnectionRefused. Sweep them deliberately, one per process:
        #   python tools_scale_sweep.py DIR BUDGET <name>
        # The bypass requires the quarantined name to appear EXACTLY in
        # the filter — a broad substring like 'q_dedup' must not drag a
        # quarantined quadratic into the shared JVM alongside healthy
        # queries (the zombie-task OOM scenario this skip exists for).
        if name in QUARANTINE and name not in (name_filter or []):
            rec = {"name": name, "status": "SKIPPED_QUARANTINED",
                   "wall_sec": 0.0, "rows": -1, "quarantined": True}
            results.append(rec)
            print(json.dumps(rec, sort_keys=True), flush=True)
            continue
        group = f"sweep-{name}"
        # one holder per iteration: a lingering cancelled thread from a
        # previous query must not overwrite THIS query's status (the
        # shared-nonlocal version misattributed a stale cancellation)
        holder = {"status": "ok", "rows": -1}
        t0 = time.monotonic()

        def run(holder=holder, name=name, group=group):
            try:
                sc.setJobGroup(group, name, interruptOnCancel=True)
                holder["rows"] = queries[name](spark, sf_dir).count()
            except Exception as exc:  # cancelled or genuinely failed
                holder["status"] = (
                    "cancelled" if "cancelled" in str(exc).lower()
                    else f"error: {type(exc).__name__}"
                )
            finally:
                # PySpark 4 dropped SparkContext.clearJobGroup; clearing
                # the thread-local property is the public equivalent
                try:
                    sc.setLocalProperty("spark.jobGroup.id", None)
                except Exception:
                    pass

        t = threading.Thread(target=run, daemon=True)
        t.start()
        t.join(budget)
        if t.is_alive():
            sc.cancelJobGroup(group)
            t.join(120)  # drain: wait for the cancel to actually land
            holder["status"] = "OVER_BUDGET" + (
                "" if not t.is_alive() else "_ZOMBIE"
            )
            if t.is_alive():
                print(json.dumps({"warn": "zombie tasks survive cancel",
                                  "name": name}), file=sys.stderr, flush=True)
        status, rows = holder["status"], holder["rows"]
        wall = round(time.monotonic() - t0, 2)
        rec = {
            "name": name,
            "status": status,
            "wall_sec": wall,
            "rows": rows,
            "quarantined": name in QUARANTINE,
        }
        results.append(rec)
        print(json.dumps(rec, sort_keys=True), flush=True)

    bad = [
        r for r in results
        if r["status"] != "ok" and not r["quarantined"]
    ]
    slow = sorted(
        (r for r in results if r["status"] == "ok"),
        key=lambda r: -r["wall_sec"],
    )[:10]
    print(json.dumps({
        "summary": True,
        "sf_dir": sf_dir,
        "budget_sec": budget,
        "total": len(results),
        "ok": sum(r["status"] == "ok" for r in results),
        "failed_or_over_budget": [r["name"] for r in bad],
        "quarantined_swept": [
            {"name": r["name"], "status": r["status"], "wall": r["wall_sec"]}
            for r in results if r["quarantined"]
        ],
        "slowest_ok": [{"name": r["name"], "wall": r["wall_sec"]} for r in slow],
    }, sort_keys=True), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
