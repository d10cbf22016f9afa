"""NFC throughput probe: Arrow pandas_udf vs a JVM UDF (verdict #6 /
SURVEY.md §4 — "a native Expression is the only performance escalation
the 100 TB design still needs" had never been measured).

Builds a tiny Java UDF1 (java.text.Normalizer NFC) at probe time with
the JDK's javac, packages it with zipfile (a jar IS a zip), attaches it
via ``spark.jars``, and times three full passes over a documents
replica:

  scan-baseline   SUM(LENGTH(text))                 — parquet+codegen floor
  pandas NFC      SUM(LENGTH(nfc_pandas(text)))     — the engine's default
  jvm NFC         SUM(LENGTH(nfc_jvm(text)))        — no Python/Arrow hop

Prints one JSON line per pass with wall seconds and chars/s. The JVM
UDF is deliberately a PROBE, not engine surface: it needs a compile
step and a session started with the jar attached, and (unlike a real
catalyst Expression) still runs outside whole-stage codegen — the
measurement decides whether that escalation is worth building at all.

Usage:
  python tools/nfc_jvm_probe.py /tmp/scale_sf10
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_JAVA_SRC = {
    "NfcNormalizeUdf": """
import java.text.Normalizer;
import org.apache.spark.sql.api.java.UDF1;

public class NfcNormalizeUdf implements UDF1<String, String> {
  @Override
  public String call(String s) {
    if (s == null) return null;
    // fast path: Normalizer.isNormalized is a cheap scan and most real
    // text is already NFC — mirrors ICU's quick-check design
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) return s;
    return Normalizer.normalize(s, Normalizer.Form.NFC);
  }
}
""",
    # NFD decomposer: builds the adversarial worst-case corpus where
    # EVERY string actually needs recomposition work
    "NfdNormalizeUdf": """
import java.text.Normalizer;
import org.apache.spark.sql.api.java.UDF1;

public class NfdNormalizeUdf implements UDF1<String, String> {
  @Override
  public String call(String s) {
    return s == null ? null : Normalizer.normalize(s, Normalizer.Form.NFD);
  }
}
""",
}


def build_udf_jar(workdir: str) -> str:
    """javac the UDF against pyspark's bundled spark-sql jar, zip it."""
    import pyspark

    jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    cp = glob.glob(os.path.join(jars_dir, "spark-sql_*.jar")) + glob.glob(
        os.path.join(jars_dir, "spark-sql-api_*.jar")
    )
    if not cp:
        cp = [os.path.join(jars_dir, "*")]
    srcs = []
    for name, body in _JAVA_SRC.items():
        src = os.path.join(workdir, f"{name}.java")
        with open(src, "w") as f:
            f.write(body)
        srcs.append(src)
    subprocess.run(
        ["javac", "-cp", os.pathsep.join(cp), "-d", workdir, *srcs],
        check=True,
    )
    jar = os.path.join(workdir, "nfc_udf.jar")
    with zipfile.ZipFile(jar, "w") as zf:
        for name in _JAVA_SRC:
            zf.write(
                os.path.join(workdir, f"{name}.class"), f"{name}.class"
            )
    return jar


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf10"
    workdir = tempfile.mkdtemp(prefix="nfc_probe_")
    jar = build_udf_jar(workdir)

    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    from nahuatl_data_pipeline_spark.functions.normalize import nfc_normalize
    from nahuatl_data_pipeline_spark.schemas import load_table
    from nahuatl_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="nfc-jvm-probe", extra_conf={"spark.jars": jar}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.udf.registerJavaFunction("nfc_jvm", "NfcNormalizeUdf", StringType())
    spark.udf.registerJavaFunction("nfd_jvm", "NfdNormalizeUdf", StringType())

    def run_suite(tag, docs):
        n_docs = docs.count()  # warm scan / materialization
        total_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]

        def timed(variant, col):
            t0 = time.perf_counter()
            out = docs.agg(F.sum(F.length(col))).collect()[0][0]
            wall = round(time.perf_counter() - t0, 2)
            print(
                json.dumps(
                    {
                        "probe": "nfc",
                        "corpus": tag,
                        "variant": variant,
                        "sf_dir": sf_dir,
                        "docs": n_docs,
                        "chars": total_chars,
                        "wall_sec": wall,
                        "chars_per_sec": round(total_chars / wall),
                        "out_chars": out,
                    }
                ),
                flush=True,
            )

        timed("scan_baseline", F.col("text"))
        timed("pandas_nfc", nfc_normalize("text"))
        timed("jvm_nfc", F.expr("nfc_jvm(text)"))

    raw = load_table(spark, sf_dir, "documents").select("text")
    run_suite("raw", raw)

    # adversarial corpus: the synthetic docs are pure ASCII (NFD is the
    # identity on them), so first macronize every vowel (the corpus's
    # own orthography — ā ē ī ō ū), THEN NFD-decompose: every vowel
    # becomes base+combining and the normalize call does real
    # recomposition work on every row
    nfd_path = os.path.join(workdir, "nfd_docs.parquet")
    raw.select(
        F.expr("nfd_jvm(translate(text, 'aeiou', 'āēīōū'))").alias("text")
    ).write.mode("overwrite").parquet(nfd_path)
    run_suite("nfd_decomposed", spark.read.parquet(nfd_path))

    # correctness cross-check: both paths must agree codepoint-for-
    # codepoint on the decomposed corpus
    probe = (
        spark.read.parquet(nfd_path)
        .limit(20000)
        .select(
            nfc_normalize("text").alias("p"),
            F.expr("nfc_jvm(text)").alias("j"),
        )
    )
    diff = probe.filter(~F.col("p").eqNullSafe(F.col("j"))).count()
    print(json.dumps({"probe": "nfc", "variant": "parity", "diff_rows": diff}))


if __name__ == "__main__":
    main()
