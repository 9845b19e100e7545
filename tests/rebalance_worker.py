"""Worker process for the cross-OS-process consumer-group rebalance test
(test_sqldb_pubsub.py::test_cross_process_group_rebalance_kill_one).

Runs a Router.run_polling loop over a shared SQLite consumer group in its
OWN SparkSession/JVM, applying each delivered message to a uuid-keyed
idempotent effects table (the SURVEY §7d exactly-once recipe). The parent
test SIGKILLs one worker mid-poll; the surviving process must drain the
group with no loss and no duplicate effects.

    python rebalance_worker.py SQLITE_PATH TOPIC GROUP EFFECTS_PATH
"""

from __future__ import annotations

import os
import sqlite3
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sqlite_path, topic, group, effects_path = sys.argv[1:5]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "2g")
        .config("spark.sql.shuffle.partitions", "4")
        .appName(f"rebalance-worker-{os.getpid()}")
        .getOrCreate()
    )
    from watermill_spark.sources.sqldb import GroupSubscriber, SQLitePubSub
    from watermill_spark.streaming import Router

    sql = SQLitePubSub(spark, sqlite_path)
    sub = GroupSubscriber(sql, group, limit=50)

    def handler(df):
        # idempotent sink: PRIMARY KEY on uuid; n counts raw deliveries
        # (at-least-once across processes), the effect applies once
        rows = df.select("uuid").collect()
        con = sqlite3.connect(effects_path, timeout=30)
        con.execute(
            "CREATE TABLE IF NOT EXISTS effects("
            "uuid TEXT PRIMARY KEY, n INTEGER)"
        )
        for (u,) in rows:
            con.execute(
                "INSERT INTO effects(uuid, n) VALUES(?, 1) "
                "ON CONFLICT(uuid) DO UPDATE SET n = n + 1",
                (u,),
            )
        con.commit()
        con.close()
        return df

    r = Router()
    r.add_handler("worker", topic, sub, None, None, handler)
    # poll forever; the parent kills/terminates us
    r.run_polling(interval_sec=0.2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
