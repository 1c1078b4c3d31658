"""S5/S6 — stdlib OOXML .xlsx reader/writer (sources/xlsx.py).

Reference semantics under test: read_excel(header=1) + Unnamed-drop +
date parse (Narrative_Miners/src/tool.py:10-26) and the multi-sheet
ExcelManager writer (ThematicScreener.ipynb cell 34).
"""

from __future__ import annotations

import datetime as dt

import pytest

from bigdata_cookbook_spark.sinks import workbook_xlsx_sink
from bigdata_cookbook_spark.sources.xlsx import (
    read_excel_sheet,
    read_xlsx_rows,
    sheet_names,
    write_xlsx,
)


@pytest.fixture()
def workbook(tmp_path):
    path = str(tmp_path / "fixture.xlsx")
    write_xlsx(
        {
            "metrics": (
                ["name", "score", "count", "when", "stamp", "ok"],
                [
                    ["alpha", 1.5, 3, dt.date(2024, 3, 1), dt.datetime(2024, 3, 1, 12, 30), True],
                    ["bravo & sons", -2.25, 0, dt.date(2023, 12, 31), dt.datetime(2023, 12, 31, 23, 59, 59), False],
                    [None, None, None, None, None, None],
                    ["<tag>", 0.0, 7, dt.date(2024, 1, 15), dt.datetime(2024, 1, 15, 0, 0), True],
                ],
            ),
            "empty": (["only_header"], []),
        },
        path,
    )
    return path


def test_round_trip_values_and_types(workbook):
    grid = read_xlsx_rows(workbook, "metrics")
    assert grid[0] == ["name", "score", "count", "when", "stamp", "ok"]
    assert grid[1] == [
        "alpha", 1.5, 3, dt.datetime(2024, 3, 1), dt.datetime(2024, 3, 1, 12, 30), True,
    ]
    assert grid[2][0] == "bravo & sons"  # escaping round-trips
    assert grid[2][1] == -2.25 and grid[2][5] is False
    assert grid[3] == [None] * 6
    assert grid[4][0] == "<tag>"
    assert grid[4][4] == dt.datetime(2024, 1, 15, 0, 0)


def test_sheet_names_and_index_access(workbook):
    assert sheet_names(workbook) == ["metrics", "empty"]
    assert read_xlsx_rows(workbook, 1) == [["only_header"]]
    assert read_xlsx_rows(workbook) == read_xlsx_rows(workbook, "metrics")
    with pytest.raises(KeyError):
        read_xlsx_rows(workbook, "nope")


def test_reference_read_semantics(spark, tmp_path):
    """Junk prologue row + header row + Unnamed column + date column —
    the exact tool.py:10-26 shape."""
    path = str(tmp_path / "ref.xlsx")
    write_xlsx(
        {
            "Sheet1": (
                ["junk title row", None, None],
                [
                    ["Company", "Unnamed: 1", "Report Date"],
                    ["Acme", "x", dt.date(2024, 2, 2)],
                    ["Globex", "y", dt.date(2024, 5, 6)],
                ],
            )
        },
        path,
    )
    df = read_excel_sheet(
        spark, path, source_name="narratives", header_offset=1, date_col="Report Date"
    )
    assert df.columns == ["Company", "Report Date", "source"]
    rows = {r["Company"]: r for r in df.collect()}
    assert rows["Acme"]["Report Date"] == dt.date(2024, 2, 2)
    assert rows["Globex"]["source"] == "narratives"


def test_workbook_xlsx_sink_multi_sheet(spark, tmp_path):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    b = spark.createDataFrame([(3.5,)], "z double")
    path = workbook_xlsx_sink({"first": a, "second": b}, str(tmp_path / "out.xlsx"))
    assert sheet_names(path) == ["first", "second"]
    first = read_xlsx_rows(path, "first")
    assert first[0] == ["k", "v"]
    assert sorted(first[1:]) == [[1, "x"], [2, "y"]]
    assert read_xlsx_rows(path, "second") == [["z"], [3.5]]


def test_round_trip_property_random_cells(tmp_path):
    """Property: any grid of strings (unicode, XML specials, whitespace),
    finite floats, ints, bools, dates and Nones survives a write/read
    round trip bit-exactly (dates come back as datetimes per OOXML
    serial-number semantics)."""
    import datetime as dt

    from hypothesis import given, settings, strategies as st

    cell = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**40), max_value=2**40),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF
            ),
            max_size=40,
        ),
        st.dates(min_value=dt.date(1900, 3, 1), max_value=dt.date(2200, 1, 1)),
    )

    @settings(max_examples=25, deadline=None)
    @given(
        rows=st.lists(st.lists(cell, min_size=3, max_size=3), min_size=1, max_size=6),
        idx=st.integers(min_value=0, max_value=10**6),
    )
    def run(rows, idx):
        path = str(tmp_path / f"prop_{idx}.xlsx")
        write_xlsx({"s": (["a", "b", "c"], rows)}, path)
        got = read_xlsx_rows(path, "s")
        assert got[0] == ["a", "b", "c"]
        for want_row, got_row in zip(rows, got[1:]):
            for want, got_v in zip(want_row, got_row):
                if isinstance(want, dt.date) and not isinstance(want, dt.datetime):
                    assert got_v == dt.datetime(want.year, want.month, want.day)
                elif isinstance(want, str) and want == "":
                    assert got_v in ("", None)  # empty inline string ~ empty cell
                elif isinstance(want, float) and want == int(want) and abs(want) < 2**53:
                    assert got_v == want  # integral floats may read back as int
                else:
                    assert got_v == want

    run()


def test_sheet_name_with_double_quote(tmp_path):
    """Sheet names are embedded in a name="..." XML attribute: a double
    quote must escape to &quot; or the workbook.xml is malformed."""
    path = str(tmp_path / "q.xlsx")
    write_xlsx({'my "quoted" sheet': (["a"], [[1]])}, path)
    assert sheet_names(path) == ['my "quoted" sheet']
    assert read_xlsx_rows(path, 'my "quoted" sheet') == [["a"], [1]]


def test_zorder_key_bit_budget():
    """bits * len(cols) > 63 must raise — JVM shifts wrap mod 64, which
    would silently scramble the clustering key."""
    import pytest as _pytest

    from bigdata_cookbook_spark.plans.layout import zorder_key

    with _pytest.raises(ValueError, match="exceeds 63"):
        zorder_key(["a", "b", "c", "d"], bits=16)
    zorder_key(["a", "b", "c", "d"], bits=15)  # 60 bits: fine
