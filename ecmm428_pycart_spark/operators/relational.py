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
ISO3_TO_ISO2 = {
    "AFG": "AF", "ALB": "AL", "DZA": "DZ", "AND": "AD", "AGO": "AO",
    "ARG": "AR", "ARM": "AM", "AUS": "AU", "AUT": "AT", "AZE": "AZ",
    "BGD": "BD", "BLR": "BY", "BEL": "BE", "BEN": "BJ", "BTN": "BT",
    "BOL": "BO", "BIH": "BA", "BWA": "BW", "BRA": "BR", "BGR": "BG",
    "BFA": "BF", "BDI": "BI", "KHM": "KH", "CMR": "CM", "CAN": "CA",
    "CAF": "CF", "TCD": "TD", "CHL": "CL", "CHN": "CN", "COL": "CO",
    "COG": "CG", "COD": "CD", "CRI": "CR", "CIV": "CI", "HRV": "HR",
    "CUB": "CU", "CYP": "CY", "CZE": "CZ", "DNK": "DK", "DJI": "DJ",
    "DOM": "DO", "ECU": "EC", "EGY": "EG", "SLV": "SV", "EST": "EE",
    "ETH": "ET", "FIN": "FI", "FRA": "FR", "GAB": "GA", "GMB": "GM",
    "GEO": "GE", "DEU": "DE", "GHA": "GH", "GRC": "GR", "GTM": "GT",
    "GIN": "GN", "HTI": "HT", "HND": "HN", "HUN": "HU", "ISL": "IS",
    "IND": "IN", "IDN": "ID", "IRN": "IR", "IRQ": "IQ", "IRL": "IE",
    "ISR": "IL", "ITA": "IT", "JAM": "JM", "JPN": "JP", "JOR": "JO",
    "KAZ": "KZ", "KEN": "KE", "KOR": "KR", "KWT": "KW", "KGZ": "KG",
    "LAO": "LA", "LVA": "LV", "LBN": "LB", "LSO": "LS", "LBR": "LR",
    "LBY": "LY", "LIE": "LI", "LTU": "LT", "LUX": "LU", "MDG": "MG",
    "MWI": "MW", "MYS": "MY", "MLI": "ML", "MLT": "MT", "MRT": "MR",
    "MEX": "MX", "MDA": "MD", "MCO": "MC", "MNG": "MN", "MNE": "ME",
    "MAR": "MA", "MOZ": "MZ", "MMR": "MM", "NAM": "NA", "NPL": "NP",
    "NLD": "NL", "NZL": "NZ", "NIC": "NI", "NER": "NE", "NGA": "NG",
    "MKD": "MK", "NOR": "NO", "OMN": "OM", "PAK": "PK", "PAN": "PA",
    "PNG": "PG", "PRY": "PY", "PER": "PE", "PHL": "PH", "POL": "PL",
    "PRT": "PT", "QAT": "QA", "ROU": "RO", "RUS": "RU", "RWA": "RW",
    "SAU": "SA", "SEN": "SN", "SRB": "RS", "SLE": "SL", "SGP": "SG",
    "SVK": "SK", "SVN": "SI", "SOM": "SO", "ZAF": "ZA", "SSD": "SS",
    "ESP": "ES", "LKA": "LK", "SDN": "SD", "SUR": "SR", "SWE": "SE",
    "CHE": "CH", "SYR": "SY", "TWN": "TW", "TJK": "TJ", "TZA": "TZ",
    "THA": "TH", "TGO": "TG", "TTO": "TT", "TUN": "TN", "TUR": "TR",
    "TKM": "TM", "UGA": "UG", "UKR": "UA", "ARE": "AE", "GBR": "GB",
    "USA": "US", "URY": "UY", "UZB": "UZ", "VEN": "VE", "VNM": "VN",
    "YEM": "YE", "ZMB": "ZM", "ZWE": "ZW",
}


def map_country_codes(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """alpha-3 → alpha-2 via broadcast mapping join (R23, main.py:208-210)."""
    spark = df.sparkSession
    mapping = spark.createDataFrame(
        [(k, v) for k, v in ISO3_TO_ISO2.items()], ["_iso3", "_iso2"])
    out_col = out_col or col
    joined = df.join(F.broadcast(mapping), df[col] == mapping["_iso3"], "left")
    return (joined.withColumn(out_col, F.coalesce(F.col("_iso2"), F.col(col)))
                  .drop("_iso3", "_iso2"))
