"""Relational operators from the reference's ETL surface (SURVEY.md §2.2).

Everything here is a thin, named composition of Catalyst built-ins —
declarative so predicate pushdown / column pruning / broadcast selection
are free. No Python UDFs in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def to_int_col(col: Column) -> Column:
    """'67,081,234' → 67081234 (reference `to_int`, main.py:79-86; R4/R22).

    Native expression — regexp_replace + cast, JVM-side, codegen'd.
    """
    return F.regexp_replace(col.cast("string"), ",", "").cast("long")


def filter_isin(df: DataFrame, col: str, values, negate: bool = False) -> DataFrame:
    """Membership filter (R5 — main.py:57,68,248-249)."""
    cond = F.col(col).isin(list(values))
    return df.filter(~cond if negate else cond)


def semi_join(df: DataFrame, keys: DataFrame, on: str) -> DataFrame:
    """pop ⋉ features (R10 — main.py:96-105 `get_sub_pop` loop semantics)."""
    return df.join(keys.select(on).distinct(), on=on, how="left_semi")


def anti_join(df: DataFrame, other: DataFrame, on: str) -> DataFrame:
    """Rows of df with no match in other (R15 — border_util.py:31-39 islands)."""
    return df.join(other.select(on).distinct(), on=on, how="left_anti")


def argmax_per_group(df: DataFrame, group_col: str, order_col: str,
                     tiebreak_col: str | None = None) -> DataFrame:
    """Keep the max-`order_col` row per group (R12 — main.py:251
    `groupby(...).idxmax()` dedup). Window + row_number: a single shuffle
    on the group key; with AQE this handles skewed groups.
    """
    order = [F.col(order_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = W.partitionBy(group_col).orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .drop("_rn"))


def running_fill(df: DataFrame, order_col: str, trigger_cond: Column,
                 value_col: str, out_col: str) -> DataFrame:
    """Ordered carry-forward fill (R21 — main.py:264-271).

    Each row gets the most recent `value_col` (in `order_col` order) from a
    row satisfying `trigger_cond`. Single unpartitioned window — correct
    but serial; callers with a partition key should pass a pre-partitioned
    window via `running_fill_by` instead.
    """
    w = (W.orderBy(order_col)
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    return df.withColumn(
        out_col,
        F.last(F.when(trigger_cond, F.col(value_col)), ignorenulls=True).over(w))


def running_fill_by(df: DataFrame, partition_col: str, order_col: str,
                    trigger_cond: Column, value_col: str, out_col: str) -> DataFrame:
    """Partitioned running fill — the scale-safe variant (one shuffle,
    parallel across partitions)."""
    w = (W.partitionBy(partition_col).orderBy(order_col)
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    return df.withColumn(
        out_col,
        F.last(F.when(trigger_cond, F.col(value_col)), ignorenulls=True).over(w))


# ISO 3166 alpha-3 → alpha-2 mapping used by the reference via
# dataprep.clean_country (main.py:208-210, R23). The Spark-idiomatic
# equivalent is a broadcast join against this small static table.
# Complete ISO 3166-1 (249 codes) + XKX→XK (Kosovo, the user-assigned
# code the World Bank dataset carries; dataprep maps it too).
ISO3_TO_ISO2 = {
    "ABW": "AW", "AFG": "AF", "AGO": "AO", "AIA": "AI", "ALA": "AX",
    "ALB": "AL", "AND": "AD", "ARE": "AE", "ARG": "AR", "ARM": "AM",
    "ASM": "AS", "ATA": "AQ", "ATF": "TF", "ATG": "AG", "AUS": "AU",
    "AUT": "AT", "AZE": "AZ", "BDI": "BI", "BEL": "BE", "BEN": "BJ",
    "BES": "BQ", "BFA": "BF", "BGD": "BD", "BGR": "BG", "BHR": "BH",
    "BHS": "BS", "BIH": "BA", "BLM": "BL", "BLR": "BY", "BLZ": "BZ",
    "BMU": "BM", "BOL": "BO", "BRA": "BR", "BRB": "BB", "BRN": "BN",
    "BTN": "BT", "BVT": "BV", "BWA": "BW", "CAF": "CF", "CAN": "CA",
    "CCK": "CC", "CHE": "CH", "CHL": "CL", "CHN": "CN", "CIV": "CI",
    "CMR": "CM", "COD": "CD", "COG": "CG", "COK": "CK", "COL": "CO",
    "COM": "KM", "CPV": "CV", "CRI": "CR", "CUB": "CU", "CUW": "CW",
    "CXR": "CX", "CYM": "KY", "CYP": "CY", "CZE": "CZ", "DEU": "DE",
    "DJI": "DJ", "DMA": "DM", "DNK": "DK", "DOM": "DO", "DZA": "DZ",
    "ECU": "EC", "EGY": "EG", "ERI": "ER", "ESH": "EH", "ESP": "ES",
    "EST": "EE", "ETH": "ET", "FIN": "FI", "FJI": "FJ", "FLK": "FK",
    "FRA": "FR", "FRO": "FO", "FSM": "FM", "GAB": "GA", "GBR": "GB",
    "GEO": "GE", "GGY": "GG", "GHA": "GH", "GIB": "GI", "GIN": "GN",
    "GLP": "GP", "GMB": "GM", "GNB": "GW", "GNQ": "GQ", "GRC": "GR",
    "GRD": "GD", "GRL": "GL", "GTM": "GT", "GUF": "GF", "GUM": "GU",
    "GUY": "GY", "HKG": "HK", "HMD": "HM", "HND": "HN", "HRV": "HR",
    "HTI": "HT", "HUN": "HU", "IDN": "ID", "IMN": "IM", "IND": "IN",
    "IOT": "IO", "IRL": "IE", "IRN": "IR", "IRQ": "IQ", "ISL": "IS",
    "ISR": "IL", "ITA": "IT", "JAM": "JM", "JEY": "JE", "JOR": "JO",
    "JPN": "JP", "KAZ": "KZ", "KEN": "KE", "KGZ": "KG", "KHM": "KH",
    "KIR": "KI", "KNA": "KN", "KOR": "KR", "KWT": "KW", "LAO": "LA",
    "LBN": "LB", "LBR": "LR", "LBY": "LY", "LCA": "LC", "LIE": "LI",
    "LKA": "LK", "LSO": "LS", "LTU": "LT", "LUX": "LU", "LVA": "LV",
    "MAC": "MO", "MAF": "MF", "MAR": "MA", "MCO": "MC", "MDA": "MD",
    "MDG": "MG", "MDV": "MV", "MEX": "MX", "MHL": "MH", "MKD": "MK",
    "MLI": "ML", "MLT": "MT", "MMR": "MM", "MNE": "ME", "MNG": "MN",
    "MNP": "MP", "MOZ": "MZ", "MRT": "MR", "MSR": "MS", "MTQ": "MQ",
    "MUS": "MU", "MWI": "MW", "MYS": "MY", "MYT": "YT", "NAM": "NA",
    "NCL": "NC", "NER": "NE", "NFK": "NF", "NGA": "NG", "NIC": "NI",
    "NIU": "NU", "NLD": "NL", "NOR": "NO", "NPL": "NP", "NRU": "NR",
    "NZL": "NZ", "OMN": "OM", "PAK": "PK", "PAN": "PA", "PCN": "PN",
    "PER": "PE", "PHL": "PH", "PLW": "PW", "PNG": "PG", "POL": "PL",
    "PRI": "PR", "PRK": "KP", "PRT": "PT", "PRY": "PY", "PSE": "PS",
    "PYF": "PF", "QAT": "QA", "REU": "RE", "ROU": "RO", "RUS": "RU",
    "RWA": "RW", "SAU": "SA", "SDN": "SD", "SEN": "SN", "SGP": "SG",
    "SGS": "GS", "SHN": "SH", "SJM": "SJ", "SLB": "SB", "SLE": "SL",
    "SLV": "SV", "SMR": "SM", "SOM": "SO", "SPM": "PM", "SRB": "RS",
    "SSD": "SS", "STP": "ST", "SUR": "SR", "SVK": "SK", "SVN": "SI",
    "SWE": "SE", "SWZ": "SZ", "SXM": "SX", "SYC": "SC", "SYR": "SY",
    "TCA": "TC", "TCD": "TD", "TGO": "TG", "THA": "TH", "TJK": "TJ",
    "TKL": "TK", "TKM": "TM", "TLS": "TL", "TON": "TO", "TTO": "TT",
    "TUN": "TN", "TUR": "TR", "TUV": "TV", "TWN": "TW", "TZA": "TZ",
    "UGA": "UG", "UKR": "UA", "UMI": "UM", "URY": "UY", "USA": "US",
    "UZB": "UZ", "VAT": "VA", "VCT": "VC", "VEN": "VE", "VGB": "VG",
    "VIR": "VI", "VNM": "VN", "VUT": "VU", "WLF": "WF", "WSM": "WS",
    "XKX": "XK", "YEM": "YE", "ZAF": "ZA", "ZMB": "ZM", "ZWE": "ZW",
}

# World Bank AGGREGATE rows present in the reference world CSV — not
# ISO 3166 countries; the reference's pipeline drops or passes them
# through unmapped (dataprep leaves them NaN; our coalesce keeps the
# alpha-3). CHI = Channel Islands (GGY+JEY aggregate).
WORLD_BANK_AGGREGATES = frozenset({
    "AFE", "AFW", "ARB", "CEB", "CHI", "CSS", "EAP", "EAR", "EAS",
    "ECA", "ECS", "EMU", "EUU", "FCS", "HIC", "HPC", "IBD", "IBT",
    "IDA", "IDB", "IDX", "INX", "LAC", "LCN", "LDC", "LIC", "LMC",
    "LMY", "LTE", "MEA", "MIC", "MNA", "NAC", "OED", "OSS", "PRE",
    "PSS", "PST", "SAS", "SSA", "SSF", "SST", "TEA", "TEC", "TLA",
    "TMN", "TSA", "TSS", "UMC", "WLD",
})


def map_country_codes(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """alpha-3 → alpha-2 via broadcast mapping join (R23, main.py:208-210)."""
    spark = df.sparkSession
    mapping = spark.createDataFrame(
        [(k, v) for k, v in ISO3_TO_ISO2.items()], ["_iso3", "_iso2"])
    out_col = out_col or col
    joined = df.join(F.broadcast(mapping), df[col] == mapping["_iso3"], "left")
    return (joined.withColumn(out_col, F.coalesce(F.col("_iso2"), F.col(col)))
                  .drop("_iso3", "_iso2"))


def scd2_apply(base: DataFrame, changes: DataFrame, key: str,
               batch_id: int, base_batch_id: int = 1) -> DataFrame:
    """Type-2 slowly-changing-dimension merge (lakehouse history table).

    ``base`` is the current version set (every row implicitly
    ``valid_from = base_batch_id``, open-ended). ``changes`` carries the
    key column ``key``, an ``op`` column ('U' update / 'I' insert /
    'D' delete), and new values for every non-key payload column of
    ``base``. Returns the full history: closed-out prior versions of
    touched keys, untouched still-open rows, and the new open versions
    — with ``valid_from``, ``valid_to`` (null = open) and
    ``is_current`` columns appended.

    Three set operations over ONE key-join shape (a left_anti + an
    inner semi on the same key): Catalyst plans them as hash joins on
    the key, so the whole merge is a single shuffle of each side (or a
    broadcast when the change feed is small — the common nightly-batch
    case). No window functions, no driver loop: at 100 TB the history
    append scales with the change feed, not the table.
    """
    payload = [c for c in base.columns if c != key]
    touched = changes.filter(F.col("op").isin("U", "D")) \
                     .select(F.col(key)).distinct()

    closed = (base.join(touched, on=key, how="left_semi")
              .withColumn("valid_from", F.lit(base_batch_id))
              .withColumn("valid_to", F.lit(batch_id))
              .withColumn("is_current", F.lit(False)))
    untouched = (base.join(touched, on=key, how="left_anti")
                 .withColumn("valid_from", F.lit(base_batch_id))
                 .withColumn("valid_to", F.lit(None).cast("int"))
                 .withColumn("is_current", F.lit(True)))
    opened = (changes.filter(F.col("op").isin("U", "I"))
              .select(key, *payload)
              .withColumn("valid_from", F.lit(batch_id))
              .withColumn("valid_to", F.lit(None).cast("int"))
              .withColumn("is_current", F.lit(True)))
    return closed.unionByName(untouched).unionByName(opened)


def snapshot_diff(v1: DataFrame, v2: DataFrame, key: str,
                  content_cols: list[str]) -> DataFrame:
    """Dataset-version diff — the corpus drift report an MLOps
    pipeline emits between snapshot releases: full outer join on the
    key, content compared through one md5 over the concatenated
    content columns (null-safe: a NULL column hashes differently
    from an empty string via a typed sentinel), every row labeled
    added / removed / changed / unchanged. Returns (key, status) —
    aggregate downstream for the report, or filter for the change
    feed.

    Scale shape: ONE full outer shuffle join on the key with 16-byte
    content digests computed map-side before the join — snapshots
    never carry their payloads through the shuffle twice; the digest
    is the only content that moves."""
    def digest(df):
        parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                 for c in content_cols]
        return df.select(F.col(key),
                         F.md5(F.concat_ws("\x01", *parts)).alias("_h"))
    a = digest(v1).withColumnRenamed("_h", "_h1")
    b = digest(v2).withColumnRenamed("_h", "_h2")
    j = a.join(b, key, "full_outer")
    status = (F.when(F.col("_h1").isNull(), F.lit("added"))
              .when(F.col("_h2").isNull(), F.lit("removed"))
              .when(F.col("_h1") == F.col("_h2"), F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select(key, status.alias("status"))
