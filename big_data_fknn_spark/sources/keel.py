"""KEEL dataset format reader/writer.

The reference consumes KEEL files (reconstructed [R
utils/keel/KeelParser.scala]; format per the KEEL project docs):

    @relation susy
    @attribute f1 real [-2.5, 17.1]
    @attribute f2 integer [0, 9]
    @attribute class {0, 1}
    @inputs f1, f2
    @outputs class
    @data
    0.12,3,1
    ...

Spark-first mapping: the tiny header is parsed on the driver into an
explicit StructType (never schema inference — a3's contract) and the
data section is a plain `spark.read.csv` with that schema — fully
distributed, pushdown-capable, identical at 100 TB.  Nominal
attributes become their double code (position in the declared value
list), matching the reference's parserToDouble behavior; min/max
ranges are kept for j5-style normalization.
"""

from __future__ import annotations

import glob
import os
import re
import shutil
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

_ATTR = re.compile(
    r"@attribute\s+(\S+)\s+(?:(real|integer)\s*\[([^\]]*)\]|\{([^}]*)\})",
    re.IGNORECASE,
)


@dataclass
class KeelSchema:
    names: list[str] = field(default_factory=list)
    kinds: dict[str, str] = field(default_factory=dict)  # real|integer|nominal
    ranges: dict[str, tuple[float, float]] = field(default_factory=dict)
    nominal_values: dict[str, list[str]] = field(default_factory=dict)
    outputs: list[str] = field(default_factory=list)

    @property
    def feature_names(self) -> list[str]:
        return [n for n in self.names if n not in self.outputs]

    def spark_schema(self) -> StructType:
        # everything lands as double — the reference's LabeledPoint
        # model (features AND class labels are doubles)
        return StructType([StructField(n, DoubleType()) for n in self.names])


def parse_keel_header(header_text: str) -> KeelSchema:
    """Parse @attribute/@outputs lines (driver-side, header is tiny)."""
    ks = KeelSchema()
    for line in header_text.splitlines():
        line = line.strip()
        m = _ATTR.match(line)
        if m:
            name, kind, rng, nominal = m.groups()
            ks.names.append(name)
            if nominal is not None:
                ks.kinds[name] = "nominal"
                ks.nominal_values[name] = [v.strip() for v in nominal.split(",")]
            else:
                ks.kinds[name] = kind.lower()
                lo, hi = (float(x) for x in rng.split(","))
                ks.ranges[name] = (lo, hi)
        elif line.lower().startswith("@outputs"):
            ks.outputs = [v.strip() for v in line.split(None, 1)[1].split(",")]
    return ks


def read_keel(
    spark: SparkSession, header_path: str, data_path: str
) -> tuple[DataFrame, KeelSchema]:
    """Load a KEEL dataset as ``(features: array<double>, label: double)``.

    The header is read on the driver (KBs); the data scan is a
    distributed CSV read with the declared schema.  Nominal columns
    are decoded to their value-list position as double, reproducing
    the reference's parserToDouble.
    """
    with open(header_path) as fh:
        ks = parse_keel_header(fh.read())

    # nominal columns must scan as string, then decode to the code
    schema = StructType(
        [
            StructField(
                n, DoubleType() if ks.kinds[n] != "nominal" else StringType()
            )
            for n in ks.names
        ]
    )
    raw = spark.read.schema(schema).option("comment", "@").csv(data_path)

    cols = []
    for n in ks.names:
        if ks.kinds[n] == "nominal":
            mapping = F.map_from_arrays(
                F.array(*[F.lit(v) for v in ks.nominal_values[n]]),
                F.array(
                    *[F.lit(float(i)) for i in range(len(ks.nominal_values[n]))]
                ),
            )
            cols.append(mapping[F.trim(F.col(n))].alias(n))
        else:
            cols.append(F.col(n))
    typed = raw.select(*cols)

    label = ks.outputs[0] if ks.outputs else ks.names[-1]
    feats = [n for n in ks.names if n != label]
    df = typed.select(
        F.array(*[F.col(n) for n in feats]).alias("features"),
        F.col(label).alias("label"),
    )
    return df, ks


def write_keel(
    df: DataFrame,
    header_path: str,
    data_path: str,
    relation: str = "dataset",
    n_features: int | None = None,
) -> None:
    """Emit a KEEL header + single CSV data file from a
    ``(features array<double>, label)`` DataFrame.

    Floats are rendered with repr-precision (17 significant digits)
    so a read_keel round trip is bit-exact.  The data section is
    written DISTRIBUTED (`df.write.text`, one part file per
    partition — executors do all the formatting and IO); the driver
    only concatenates the finished part files byte-for-byte into the
    single KEEL data file, so no row ever funnels through driver
    memory.  At scale you'd skip the concat and ship the partitioned
    directory itself."""
    # the feature count lives in the DATA (array length), so an empty
    # frame can't infer it — callers that know their width pass it
    if n_features is not None:
        nfeat = int(n_features)
    else:
        first = df.select(F.size("features").alias("n")).first()
        nfeat = int(first["n"]) if first else 0
    stats = df.select(
        *[
            f(F.element_at("features", i + 1)).alias(f"{agg}{i}")
            for i in range(nfeat)
            for agg, f in (("mn", F.min), ("mx", F.max))
        ],
        F.min("label").alias("lmn"),
        F.max("label").alias("lmx"),
    ).first()
    lines = [f"@relation {relation}"]
    for i in range(nfeat):
        # an empty frame has no observed ranges — declare [0.0, 0.0]
        # rather than writing the literal string 'None' into a header
        # the reader must parse as floats
        mn = stats[f"mn{i}"] if stats and stats[f"mn{i}"] is not None else 0.0
        mx = stats[f"mx{i}"] if stats and stats[f"mx{i}"] is not None else 0.0
        lines.append(f"@attribute f{i} real [{mn!r}, {mx!r}]")
    # the class enumeration lists real classes only; a NULL label is
    # KEEL's missing value ('?' in the data section), not a class
    classes = ", ".join(
        str(int(r["label"]))
        for r in df.select("label").distinct().orderBy("label").collect()
        if r["label"] is not None
    )
    lines.append(f"@attribute class {{{classes}}}")
    lines.append("@inputs " + ", ".join(f"f{i}" for i in range(nfeat)))
    lines.append("@outputs class")
    with open(header_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    out = df.select(
        F.concat_ws(
            ",",
            *[
                F.format_string("%.17g", F.element_at("features", i + 1))
                for i in range(nfeat)
            ],
            # KEEL renders a missing value as '?' — a bare NULL would
            # make concat_ws drop the field and shift the CSV row
            F.coalesce(
                F.col("label").cast("bigint").cast("string"), F.lit("?")
            ),
        ).alias("line")
    )
    tmp_dir = tempfile.mkdtemp(prefix="keel_data_parts_")
    try:
        out.write.mode("overwrite").text(tmp_dir)
        with open(data_path, "wb") as fh:
            fh.write(b"@data\n")
            for part in sorted(glob.glob(os.path.join(tmp_dir, "part-*"))):
                with open(part, "rb") as pf:
                    shutil.copyfileobj(pf, fh)
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)
