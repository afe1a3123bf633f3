"""Hive-enabled session parity (``Hive2ES.scala:33-37``).

The catalog implementation is fixed at the first session in a JVM, so this
runs in a subprocess: build ``get_spark(enable_hive=True)``, persist a
catalog table, and resolve it through ``read_table(spark, "db.tbl")`` —
the reference's only input path.
"""

import subprocess
import sys
import textwrap


def test_hive_session_resolves_catalog_table(tmp_path):
    script = textwrap.dedent(
        f"""
        import os, sys
        sys.path.insert(0, "/root/repo")
        os.chdir({str(tmp_path)!r})  # derby metastore + warehouse land here
        from hive2es_offline_spark.session import get_spark
        from hive2es_offline_spark.sources import read_table

        spark = get_spark(
            "hive-parity-test",
            master="local[2]",
            extra_conf={{
                "spark.sql.warehouse.dir": os.path.join({str(tmp_path)!r}, "wh"),
                "spark.driver.memory": "1g",
            }},
            enable_hive=True,
        )
        assert spark.conf.get("spark.sql.catalogImplementation") == "hive", (
            spark.conf.get("spark.sql.catalogImplementation")
        )
        spark.sql("CREATE DATABASE db")
        spark.range(5).selectExpr("id", "id * 2 AS v").write.saveAsTable("db.tbl")
        got = read_table(spark, "db.tbl", where="v >= 4", columns=["id"])
        rows = sorted(r["id"] for r in got.collect())
        assert rows == [2, 3, 4], rows
        print("HIVE_OK")
        spark.stop()
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "HIVE_OK" in proc.stdout
