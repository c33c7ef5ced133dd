"""External connectors: REST acquisition, JDBC, blob listing, Excel.

These are acquisition/egress edges, not engine ops (SURVEY §2.1): the
REST fetch is driver-side by nature (the reference pages a government
API, fetch_communes.py:116-154); JDBC rides Spark's built-in connector
(needs a driver jar on the classpath — probed, not assumed); blob
listing maps to Hadoop FS listing. Excel is driver-side pandas
(scraper egress only, ingestion/Scraping/scrape_taux.py:126-130).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def fetch_rest_records(
    fetcher: Callable[[str], str],
    url_template: str,
    partitions: Sequence[str],
) -> list[dict]:
    """Paged REST fetch, one call per partition value (the per-department
    loop of fetch_communes.py:116-154). ``fetcher`` is injected —
    tests pass a stub; production passes urllib/requests."""
    records: list[dict] = []
    for part in partitions:
        payload = json.loads(fetcher(url_template.format(part)))
        records.extend(payload if isinstance(payload, list) else payload.get("communes", []))
    return records


def rest_to_dataframe(
    spark: SparkSession,
    fetcher: Callable[[str], str],
    url_template: str,
    partitions: Sequence[str],
    schema: str,
) -> DataFrame:
    """src_rest_api: acquisition → DataFrame with declared schema."""
    return spark.createDataFrame(
        fetch_rest_records(fetcher, url_template, partitions), schema=schema
    )


def jdbc_available(spark: SparkSession, driver_class: str) -> bool:
    """Probe the classpath for a JDBC driver instead of failing mid-job."""
    try:
        spark._jvm.java.lang.Class.forName(driver_class)  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001 - absence is the signal
        return False


def read_jdbc(
    spark: SparkSession, url: str, table: str, driver_class: str, **options
) -> DataFrame:
    """src_jdbc (load_facts.py:105 pd.read_sql analog). Raises a clear
    error when no driver jar is present (none ships in this image)."""
    if not jdbc_available(spark, driver_class):
        raise RuntimeError(
            f"JDBC driver {driver_class} not on the classpath; add the jar "
            "via spark.jars to use JDBC sources"
        )
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


_IF_EXISTS_TO_MODE = {"replace": "overwrite", "append": "append", "fail": "errorifexists"}


def write_jdbc(
    df: DataFrame, url: str, table: str, driver_class: str,
    if_exists: str = "replace", batchsize: int = 10_000, **options
) -> None:
    """snk_jdbc_batch (export_to_sql.py:160-203): pandas if_exists modes
    → Spark save modes; chunked multi-row inserts → the connector's
    batchsize (distributed writers replace the driver-side chunk loop)."""
    if not jdbc_available(df.sparkSession, driver_class):
        raise RuntimeError(
            f"JDBC driver {driver_class} not on the classpath; add the jar "
            "via spark.jars to use JDBC sinks"
        )
    writer = (
        df.write.format("jdbc")
        .mode(_IF_EXISTS_TO_MODE[if_exists])
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def list_blobs(spark: SparkSession, path: str, suffix: str = "") -> list[str]:
    """src_blob_list (data_loader.py:44-45): list object names under a
    prefix via the Hadoop FS API — works for file://, s3a://, abfss://."""
    jvm = spark._jvm  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out = []
    for status in fs.listStatus(p):
        name = status.getPath().getName()
        if name.endswith(suffix):
            out.append(name)
    return sorted(out)


import re as _re

# XML 1.0 legal character ranges: tab/LF/CR, then 0x20+ minus the
# surrogate block and the two non-characters. Anything else (control
# chars that real text corpora do contain) must not reach the sheet —
# escape() does NOT handle them and the file would be unreadable.
_XML_ILLEGAL = _re.compile(
    "[^\u0009\u000a\u000d\u0020-\ud7ff\ue000-\ufffd"
    "\U00010000-\U0010ffff]"
)


def _xlsx_cell(ref: str, value) -> str:
    """One sheet cell: numbers as native numeric cells, booleans as the
    boolean type, everything else as an inline string (no shared-string
    table — self-contained rows, and the writer stays streaming).
    Characters illegal in XML 1.0 are replaced with U+FFFD."""
    from xml.sax.saxutils import escape

    if value is None:
        return f'<c r="{ref}"/>'
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        if isinstance(value, float) and (value != value or value in (float("inf"), float("-inf"))):
            return f'<c r="{ref}" t="inlineStr"><is><t>{value}</t></is></c>'
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    text = _XML_ILLEGAL.sub("�", str(value))
    return (
        f'<c r="{ref}" t="inlineStr"><is>'
        f'<t xml:space="preserve">{escape(text)}</t></is></c>'
    )


def _col_letter(i: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_excel(df: DataFrame, path: str, max_rows: int = 100_000) -> None:
    """snk_excel (scrape_taux.py:126-130) — driver-side spreadsheet
    egress, bounded like every presentation-layer collect in this
    engine. Implemented directly on the OOXML container format (an
    .xlsx is a zip of XML parts) with only the stdlib, so the sink is
    real in this image rather than gated on openpyxl; output is
    deterministic (fixed zip timestamps, inline strings, no styles)."""
    import zipfile

    rows = df.limit(max_rows).collect()
    cols = df.columns

    def sheet_rows():
        yield "".join(
            _xlsx_cell(f"{_col_letter(i)}1", c) for i, c in enumerate(cols)
        )
        for r, row in enumerate(rows, start=2):
            yield "".join(
                _xlsx_cell(f"{_col_letter(i)}{r}", row[i])
                for i in range(len(cols))
            )

    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(
            f'<row r="{n}">{cells}</row>'
            for n, cells in enumerate(sheet_rows(), start=1)
        )
        + "</sheetData></worksheet>"
    )
    parts = {
        "[Content_Types].xml": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
            'content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/'
            'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="'
            "application/vnd.openxmlformats-officedocument.spreadsheetml."
            'worksheet+xml"/></Types>'
        ),
        "_rels/.rels": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
            '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            'officeDocument" Target="xl/workbook.xml"/></Relationships>'
        ),
        "xl/workbook.xml": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.'
            'org/officeDocument/2006/relationships"><sheets>'
            '<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
        ),
        "xl/_rels/workbook.xml.rels": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
            '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/worksheet\" "
            'Target="worksheets/sheet1.xml"/></Relationships>'
        ),
        "xl/worksheets/sheet1.xml": sheet,
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in parts.items():
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, content)
