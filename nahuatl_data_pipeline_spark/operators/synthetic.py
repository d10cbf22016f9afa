"""M6: synthetic training-pair generation as a DISTRIBUTED operator
(reference ``scripts/generate_synthetic_data.py`` — driver-side Python
loops over seed dicts; here the same expansion is DataFrame ops so the
volume knob is a cross join, not a bigger for-loop).

Shapes mirrored from the reference:
- base seed rows per grammar category (:34-137)
- number × animal counting compounds (:148-163)
- Mi/Tu possessive prefix rows over family terms (:165-180)
- time × verb adverbial compounds (:221-246)
- "Estoy <location>" prepositional rows (:248-261)

Every expansion is deterministic (no ``random.choice``): both the Spark
plan and a DuckDB oracle built from the SAME seed constants produce
identical rows, so q51 is hash-checked end-to-end. ``multiplier``
cross-joins a range to scale output volume arbitrarily (each replica
tagged with a variant index) — that is the 100 TB path: seeds stay tiny
and broadcast; the cross join fans out executor-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# seed vocabulary (es, nah, myn) per category — generate_synthetic_data.py:34-137
SEED_DATA: dict[str, list[tuple[str, str, str]]] = {
    "greetings": [
        ("Buenos días", "Cualli tonalli", "Ma'alob k'iin"),
        ("Hola", "Niltze", "Ba'ax ka wa'alik"),
        ("Gracias", "Tlazohcamati", "Dios bo'otik"),
    ],
    "numbers": [
        ("uno", "ce", "jun"),
        ("dos", "ome", "ka'a"),
        ("tres", "yei", "óox"),
        ("cuatro", "nahui", "kan"),
        ("cinco", "macuilli", "ho'o"),
    ],
    "colors": [
        ("blanco", "iztac", "sak"),
        ("negro", "tliltic", "box"),
        ("rojo", "chichiltic", "chak"),
        ("amarillo", "coztic", "k'an"),
    ],
    "family": [
        ("madre", "nantli", "na'"),
        ("padre", "tahtli", "tata"),
        ("hijo", "pilli", "paal"),
        ("hermano", "icniuhtli", "suku'un"),
        ("abuela", "citli", "nohoch mama"),
    ],
    "animals": [
        ("perro", "chichi", "peek'"),
        ("gato", "miztli", "mis"),
        ("jaguar", "ocelotl", "balam"),
        ("águila", "cuauhtli", "koot"),
        ("mariposa", "papalotl", "pepen"),
    ],
    "verbs_present": [
        ("Yo como", "Nitlacua", "Kin hanal"),
        ("Él camina", "Nemi", "Ku xíimbal"),
        ("Tú bebes", "Ti atl ic", "Ka uk'ik"),
    ],
    "time_words": [
        ("hoy", "axcan", "bejla'e'"),
        ("mañana", "moztla", "sáamal"),
        ("ayer", "yalhua", "ho'olhéel"),
    ],
    "locations": [
        ("en la casa", "calli", "ich naj"),
        ("en el campo", "milli", "ich k'áax"),
        ("en el río", "atoyatl", "ich ha'"),
        ("en la montaña", "tepetl", "ich witz"),
    ],
}

_COMPOUND_CATS = {"time_words", "locations"}  # consumed by templates only


def seed_dataframe(
    spark: SparkSession, category: str, alias: str = ""
) -> DataFrame:
    """One category's seed rows as a (tiny, broadcastable) DataFrame.

    Built VIA PANDAS on purpose: an Arrow-converted local frame becomes a
    JVM LocalTableScan, while createDataFrame over a Python list builds a
    Python-RDD-backed scan that round-trips through Python workers on
    EVERY action (measured: a 3×2 crossJoin.count() costs ~8.5 s via the
    list path vs 0.26 s via pandas — and the list path additionally
    slices 5 rows across defaultParallelism partitions)."""
    import pandas as pd

    pre = alias + "_" if alias else ""
    cols = [f"{pre}es", f"{pre}nah", f"{pre}myn"]
    pdf = pd.DataFrame(SEED_DATA[category], columns=cols)
    return spark.createDataFrame(
        pdf, schema=", ".join(f"{c} string" for c in cols)
    )


def generate_synthetic_corpus(
    spark: SparkSession, multiplier: int = 1
) -> DataFrame:
    """Full deterministic expansion → (es, nah, myn, category) rows.

    ``multiplier`` > 1 replicates the corpus via a range cross join with a
    ``variant`` tag appended to es — arbitrary volume with zero driver
    involvement (generate_synthetic_data.py scales by re-running the
    Python loop; here it's one more cross join in the same plan).
    """
    base = [
        seed_dataframe(spark, cat).select(
            "es", "nah", "myn", F.lit(cat).alias("category")
        )
        for cat in SEED_DATA
        if cat not in _COMPOUND_CATS
    ]

    # numbers × animals counting compounds (:148-163)
    num = seed_dataframe(spark, "numbers", "n")
    ani = seed_dataframe(spark, "animals", "a")
    counting = num.crossJoin(ani).select(
        F.concat_ws(" ", "n_es", "a_es").alias("es"),
        F.concat_ws(" ", "n_nah", "a_nah").alias("nah"),
        # Maya numeral classifier túul for animates (:161)
        F.concat_ws(" ", "n_myn", F.lit("túul"), "a_myn").alias("myn"),
        F.lit("numbers").alias("category"),
    )

    # Mi/Tu possessives over family (:165-180): nah prefixes no-/mo-
    fam = seed_dataframe(spark, "family", "f")
    import pandas as pd

    prefixes = spark.createDataFrame(
        pd.DataFrame(
            [("Mi", "No", "In"), ("Tu", "Mo", "A")],
            columns=["p_es", "p_nah", "p_myn"],
        ),
        schema="p_es string, p_nah string, p_myn string",
    )
    poss = fam.crossJoin(prefixes).select(
        F.concat_ws(" ", "p_es", "f_es").alias("es"),
        F.concat(F.col("p_nah"), F.col("f_nah")).alias("nah"),
        F.concat_ws(" ", "p_myn", "f_myn").alias("myn"),
        F.lit("possessives").alias("category"),
    )

    # verbs × time adverbials (:221-246)
    vb = seed_dataframe(spark, "verbs_present", "v")
    tm = seed_dataframe(spark, "time_words", "t")
    timed = vb.crossJoin(tm).select(
        F.concat_ws(" ", "v_es", "t_es").alias("es"),
        F.concat_ws(" ", "v_nah", "t_nah").alias("nah"),
        F.concat_ws(" ", "v_myn", "t_myn").alias("myn"),
        F.lit("time").alias("category"),
    )

    # "Estoy <location>" (:248-261)
    loc = seed_dataframe(spark, "locations", "l")
    located = loc.select(
        F.concat(F.lit("Estoy "), F.col("l_es")).alias("es"),
        F.concat(F.lit("Nica "), F.col("l_nah")).alias("nah"),
        F.concat(F.lit("Yaan in "), F.col("l_myn")).alias("myn"),
        F.lit("prepositions").alias("category"),
    )

    out = base[0]
    for df in base[1:] + [counting, poss, timed, located]:
        out = out.unionByName(df)

    if multiplier > 1:
        reps = spark.range(multiplier).select(
            F.col("id").cast("int").alias("variant")
        )
        out = out.crossJoin(reps).select(
            F.when(F.col("variant") == 0, F.col("es"))
            .otherwise(F.concat_ws(" ", "es", F.lit("(v"),
                                   F.col("variant").cast("string"),
                                   F.lit(")")))
            .alias("es"),
            "nah", "myn", "category",
        )
    return out


# --------------------------------------------------------------------------
# DuckDB oracle built from the SAME seed constants
# --------------------------------------------------------------------------

def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _values(cat: str) -> str:
    return ", ".join(
        f"({_sq(es)}, {_sq(nah)}, {_sq(myn)})"
        for es, nah, myn in SEED_DATA[cat]
    )


def synthetic_oracle_sql() -> str:
    """ANSI SQL producing exactly ``generate_synthetic_corpus(spark, 1)``."""
    base_selects = [
        f"SELECT es, nah, myn, {_sq(cat)} AS category FROM {cat}"
        for cat in SEED_DATA
        if cat not in _COMPOUND_CATS
    ]
    ctes = ", ".join(
        f"{cat}(es, nah, myn) AS (VALUES {_values(cat)})" for cat in SEED_DATA
    )
    parts = base_selects + [
        # numbers × animals
        "SELECT n.es || ' ' || a.es, n.nah || ' ' || a.nah, "
        "n.myn || ' túul ' || a.myn, 'numbers' "
        "FROM numbers n CROSS JOIN animals a",
        # possessives
        "SELECT p.p_es || ' ' || f.es, p.p_nah || f.nah, "
        "p.p_myn || ' ' || f.myn, 'possessives' "
        "FROM family f CROSS JOIN (VALUES ('Mi', 'No', 'In'), "
        "('Tu', 'Mo', 'A')) AS p(p_es, p_nah, p_myn)",
        # verbs × time
        "SELECT v.es || ' ' || t.es, v.nah || ' ' || t.nah, "
        "v.myn || ' ' || t.myn, 'time' "
        "FROM verbs_present v CROSS JOIN time_words t",
        # locations
        "SELECT 'Estoy ' || es, 'Nica ' || nah, 'Yaan in ' || myn, "
        "'prepositions' FROM locations",
    ]
    union = " UNION ALL ".join(parts)
    return (
        f"WITH {ctes} SELECT t.es, t.nah, t.myn, t.category "
        f"FROM ({union}) AS t(es, nah, myn, category)"
    )
