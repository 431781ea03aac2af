"""Native xlsx codec (sources/xlsx.py): stdlib zip+OOXML round-trip."""

import pyarrow as pa

from langscrape_ray.sources.xlsx import (
    col_letter,
    read_xlsx,
    read_xlsx_bytes,
    write_xlsx,
    xlsx_bytes,
)


def test_col_letter_a1_notation():
    assert [col_letter(i) for i in (0, 1, 25, 26, 27, 51, 52, 701, 702)] == [
        "A", "B", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA",
    ]


def test_roundtrip_types_and_escaping():
    t = pa.table(
        {
            "i": pa.array([1, -7, None], pa.int64()),
            "f": pa.array([1.5, -0.25, None], pa.float64()),
            "s": pa.array(['a<b&"c"', "naïve — ünïcode", None], pa.string()),
            "b": pa.array([True, False, None], pa.bool_()),
        }
    )
    out = read_xlsx_bytes(xlsx_bytes(t))
    assert out.schema == t.schema
    assert out.to_pylist() == t.to_pylist()


def test_roundtrip_wide_table_past_z_columns():
    # 30 columns exercises the AA.. column-letter math on write AND read
    t = pa.table({f"c{i:02d}": pa.array([i, i * 11], pa.int64()) for i in range(30)})
    out = read_xlsx_bytes(xlsx_bytes(t))
    assert out.column_names == t.column_names
    assert out.to_pylist() == t.to_pylist()


def test_bytes_deterministic_and_zip_valid():
    import zipfile
    from io import BytesIO

    t = pa.table({"x": pa.array([1, 2], pa.int64()), "y": pa.array(["a", "b"])})
    b1, b2 = xlsx_bytes(t), xlsx_bytes(t)
    assert b1 == b2  # fixed zip timestamps => byte-stable
    with zipfile.ZipFile(BytesIO(b1)) as z:
        assert z.testzip() is None
        names = set(z.namelist())
    assert {"[Content_Types].xml", "xl/workbook.xml",
            "xl/worksheets/sheet1.xml"} <= names


def test_int_float_column_mixing_lands_float():
    # xlsx numerics are untyped; a column whose lexical forms mix int and
    # float parses as float64 (the documented rule)
    t = pa.table({"v": pa.array([1.0, 2.5], pa.float64())})
    out = read_xlsx_bytes(xlsx_bytes(t))
    # 1.0 serializes as '1.0' via repr -> float; stays float64
    assert out["v"].type == pa.float64()
    assert out["v"].to_pylist() == [1.0, 2.5]


def test_file_write_read(tmp_path):
    t = pa.table({"doc_id": pa.array([10, 20], pa.int64()),
                  "name": pa.array(["x", "y"])})
    p = str(tmp_path / "out.xlsx")
    write_xlsx(t, p)
    assert read_xlsx(p).to_pylist() == t.to_pylist()


def test_empty_table():
    t = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.string())})
    out = read_xlsx_bytes(xlsx_bytes(t))
    assert out.num_rows == 0
    assert out.column_names == ["a", "b"]


def test_xlsx_roundtrip_pipeline_matches_flatten(ray_session):
    """The driver query: flat records pushed through real xlsx bytes must
    equal the json_etl_flatten output exactly."""
    from langscrape_ray.pipelines.etl import json_etl_flatten, xlsx_roundtrip

    sf = "/root/testdata/sf0.001"
    a = json_etl_flatten(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = xlsx_roundtrip(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    assert a.equals(b)
