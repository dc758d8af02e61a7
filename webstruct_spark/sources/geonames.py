# -*- coding: utf-8 -*-
"""GeoNames gazetteer source (S6/S7): TSV reader with the reference's
fixed 19-column schema (/root/reference/webstruct/gazetteers/
geonames.py:13-29) and the alias-compile step — explode comma-joined
``alternatenames`` into one row per alias (``_split_names_into_rows``,
geonames.py:109-133) — re-expressed as ``spark.read.csv`` +
``explode(split(...))``.

The reference then packs aliases into a trie for broadcast; our
equivalent is the normalized alias DataFrame consumed by
operators/linking.py (broadcast hash join) or collected into the
RuleModel matcher dict.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GEONAMES_SCHEMA = T.StructType(
    [
        T.StructField("geonameid", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("asciiname", T.StringType()),
        T.StructField("alternatenames", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("feature_class", T.StringType()),
        T.StructField("feature_code", T.StringType()),
        T.StructField("country_code", T.StringType()),
        T.StructField("cc2", T.StringType()),
        T.StructField("admin1_code", T.StringType()),
        T.StructField("admin2_code", T.StringType()),
        T.StructField("admin3_code", T.StringType()),
        T.StructField("admin4_code", T.StringType()),
        T.StructField("population", T.LongType()),
        T.StructField("elevation", T.StringType()),
        T.StructField("dem", T.StringType()),
        T.StructField("timezone", T.StringType()),
        T.StructField("modification_date", T.StringType()),
    ]
)

_CLASS_TO_TYPE = {"P": "CITY", "A": "STATE", "L": "COUNTRY"}

_SAMPLE_NAMES = (
    "Dallas Austin Boston Denver Seattle Portland Atlanta Chicago "
    "Phoenix Tucson Omaha Boise Raleigh Memphis Nashville Tulsa "
    "Fresno Oakland Anaheim Tampa Orlando Reno Spokane Lubbock"
).split()


def materialize_sample_tsv(path: str, n: int = 120) -> str:
    """Deterministic GeoNames-format sample TSV (no external data):
    n rows cycling through name stems with synthetic alternate names,
    feature classes and populations."""
    import os

    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    classes = ["P", "A", "L", "H"]
    lines = []
    for i in range(n):
        stem = _SAMPLE_NAMES[i % len(_SAMPLE_NAMES)]
        name = "%s %d" % (stem, i) if i >= len(_SAMPLE_NAMES) else stem
        alts = "%s City,Old %s" % (name, name) if i % 3 else ""
        fclass = classes[i % 4]
        pop = (i * 9173) % 1000000
        cols = [
            str(100000 + i), name, name, alts, "10.5", "-20.25",
            fclass, "PPL", "US", "", "TX", "", "", "",
            str(pop), "", "100", "America/Chicago", "2020-01-01",
        ]
        lines.append("\t".join(cols))
    with open(path + ".tmp", "w") as f:
        f.write("\n".join(lines) + "\n")
    os.rename(path + ".tmp", path)
    return path


def read_geonames(spark: SparkSession, path: str) -> DataFrame:
    """Read a GeoNames-format TSV dump with the fixed schema."""
    return spark.read.csv(
        path, sep="\t", schema=GEONAMES_SCHEMA, header=False, quote=""
    )


def alias_rows(geonames: DataFrame) -> DataFrame:
    """Explode name + asciiname + alternatenames into one row per
    alias: (alias, canonical_id, entity_type, weight).

    weight = log10(population+10) as a popularity prior (the GeoNames
    analog of the synthetic gazetteer's Zipf weight)."""
    names = geonames.select(
        "geonameid",
        "feature_class",
        "population",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.concat(
                        F.array("name", "asciiname"),
                        F.split(F.coalesce("alternatenames", F.lit("")), ","),
                    ),
                    lambda x: (x.isNotNull()) & (F.length(F.trim(x)) > 0),
                )
            )
        ).alias("alias"),
    )
    etype = F.coalesce(
        *[
            F.when(F.col("feature_class") == k, F.lit(v))
            for k, v in _CLASS_TO_TYPE.items()
        ],
        F.lit("PLACE"),
    )
    return names.select(
        F.trim("alias").alias("alias"),
        F.concat(F.lit("GEO:"), F.col("geonameid").cast("string")).alias(
            "canonical_id"
        ),
        etype.alias("entity_type"),
        F.round(F.log10(F.col("population") + F.lit(10)), 6).alias("weight"),
    )
