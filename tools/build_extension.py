"""Compile the Catalyst extension (datafusion_test_spark/jvm/*.scala) into
dfts-extensions.jar using the Scala compiler BUNDLED with the pyspark
distribution — no external toolchain.

Usage: python tools/build_extension.py  ->  prints the jar path.

The jar is a session-static plugin: it must be on the driver classpath with
``spark.sql.extensions=dfts.DftsExtensions`` BEFORE the JVM starts, so it is
exercised by tests/test_extensions.py in a fresh subprocess rather than by a
declared query (the external driver builds its own plain session, which must
keep working without the jar).
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "datafusion_test_spark", "jvm", "DftsExtensions.scala")
OUT_DIR = os.path.join(REPO, "datafusion_test_spark", "jvm", "_build")
JAR = os.path.join(REPO, "datafusion_test_spark", "jvm", "dfts-extensions.jar")


def spark_jars_dir() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "jars")


def build(force: bool = False) -> str:
    # rebuild when the source is newer than the jar, not just when missing —
    # otherwise rule edits silently test the stale committed binary
    if (
        os.path.exists(JAR)
        and not force
        and os.path.getmtime(JAR) >= os.path.getmtime(SRC)
    ):
        return JAR
    jars = spark_jars_dir()
    if not glob.glob(os.path.join(jars, "scala-compiler-*.jar")):
        raise RuntimeError("no bundled scala-compiler jar found")
    java = os.path.join(os.environ.get("JAVA_HOME", ""), "bin", "java")
    if not os.path.exists(java):
        java = "java"
    shutil.rmtree(OUT_DIR, ignore_errors=True)
    os.makedirs(OUT_DIR, exist_ok=True)
    cp = os.path.join(jars, "*")
    subprocess.run(
        [
            java,
            "-cp",
            cp,
            "scala.tools.nsc.Main",
            "-classpath",
            cp,
            "-d",
            OUT_DIR,
            SRC,
        ],
        check=True,
        capture_output=True,
        text=True,
    )
    # Reproducible jar: fixed entry timestamps (zip embeds file mtimes, so a
    # naive rebuild always produces different bytes) and sorted entry order.
    # Rebuilt-but-identical output then leaves the committed jar untouched —
    # no permanent 'M …/dfts-extensions.jar' churn from every test run.
    tmp_jar = JAR + ".tmp"
    entries = []
    for root, _dirs, files in os.walk(OUT_DIR):
        for f in files:
            full = os.path.join(root, f)
            entries.append((os.path.relpath(full, OUT_DIR), full))
    with zipfile.ZipFile(tmp_jar, "w") as zf:
        for arcname, full in sorted(entries):
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            with open(full, "rb") as fh:
                zf.writestr(info, fh.read())
    shutil.rmtree(OUT_DIR, ignore_errors=True)
    if os.path.exists(JAR):
        with open(JAR, "rb") as a, open(tmp_jar, "rb") as b:
            same = a.read() == b.read()
        if same:
            os.remove(tmp_jar)
            return JAR
    os.replace(tmp_jar, JAR)
    return JAR


if __name__ == "__main__":
    try:
        print(build(force="--force" in sys.argv))
    except subprocess.CalledProcessError as e:
        print(e.stdout)
        print(e.stderr, file=sys.stderr)
        sys.exit(1)
