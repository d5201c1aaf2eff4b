"""DWD (German weather service) observation files.

Reference: `data_io.py:107-225`. Semicolon-CSV with ``-999`` nodata, a
``MESS_DATUM`` index (``yyyyMMddHH`` for hourly), German column names,
°C→K conversion, and a trailing junk line. Multiple hourly files
(RR/TU/FF products) combine via a full outer join on the timestamp —
Spark-native instead of the reference's pandas join loop.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DWD_RENAME = {
    "LUFTTEMPERATUR": "tmean",
    "LUFTTEMPERATUR_MINIMUM": "tmin",
    "LUFTTEMPERATUR_MAXIMUM": "tmax",
    "NIEDERSCHLAGSHOEHE": "precip",
    "GLOBAL_KW_J": "glob",
    "REL_FEUCHTE": "hum",
    "WINDGESCHWINDIGKEIT": "wind",
    "SONNENSCHEINDAUER": "sun_h",
}
TEMP_COLS = ("tmin", "tmax", "tmean", "temp")


def read_dwd_metadata(spark: SparkSession, metadata_file: str) -> dict:
    """Station header from the DWD metadata CSV (`data_io.py:138-150`):
    last valid row's id/name/lat/lon."""
    meta = (
        spark.read.option("header", True)
        .option("sep", ";")
        .csv(metadata_file)
        .toPandas()
    )
    meta.columns = [c.strip() for c in meta.columns]
    meta = meta.dropna(how="all")
    last = meta.iloc[-1]
    return {
        "Stations_id": last["Stations_id"],
        "Stationsname": last["Stationsname"],
        "Breite": float(last.iloc[2]),
        "Laenge": float(last.iloc[3]),
    }


def _read_single(spark: SparkSession, filename: str, mode: str) -> DataFrame:
    df = (
        spark.read.option("header", True)
        .option("sep", ";")
        .option("nanValue", "-999")
        .csv(filename)
    )
    df = df.select(*[F.col(c).alias(c.strip()) for c in df.columns])

    if mode == "d":
        ts = F.to_timestamp(F.trim(F.col("MESS_DATUM")))
    else:
        # yyyyMMddHH composite (`data_io.py:171-178`)
        ts = F.to_timestamp(F.trim(F.col("MESS_DATUM")), "yyyyMMddHH")
    df = df.withColumn("ts", ts)
    # the trailing malformed line has no parsable date
    df = df.filter(F.col("ts").isNotNull())

    keep = []
    for c in df.columns:
        if c in DWD_RENAME:
            v = F.col(c).cast("double")
            v = F.when(v == -999, None).otherwise(v)
            name = DWD_RENAME[c]
            if name in TEMP_COLS:
                v = v + 273.15  # °C→K (`data_io.py:199-207`)
            keep.append(v.alias(name))
    return df.select("ts", *keep)


def read_dwd(
    spark: SparkSession,
    filename: str | list[str],
    metadata: str,
    mode: str = "d",
    station_id: str | None = None,
) -> tuple[dict, DataFrame]:
    """Read one or several DWD files into a long DataFrame.

    Multiple hourly product files are combined with a full outer join
    on ts (`data_io.py:211-220`). Returns (header, DataFrame).
    """
    header = read_dwd_metadata(spark, metadata)
    sid = station_id or str(header["Stations_id"]).strip()

    files = filename if isinstance(filename, list) else [filename]
    frames = [_read_single(spark, f, mode) for f in files]
    data = reduce(lambda a, b: a.join(b, "ts", "outer"), frames)
    return header, data.select(F.lit(sid).alias("station_id"), "*")
