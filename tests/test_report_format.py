"""Literal formatting parity for report/value writers (the reference's
iomanip setw/precision layout, compute_ms_pml.cpp:877-886,1012-1019)."""

import io

import numpy as np

from spumoni_tpu.classify.report import (ks_report_header, report_header,
                                         report_line, write_values_record)


def test_report_header_literal():
    # setw(30)"read id:" setw(15)"status:" setw(19)"avg max-value (thr="
    # setw(2)thr setw(5)"):" setw(12)"above thr:" setw(12)"below thr:"
    h = report_header(9)
    assert h == ("read id:                      "
                 "status:        "
                 "avg max-value (thr="
                 "9 "
                 "):   "
                 "above thr:  "
                 "below thr:  \n")


def test_report_line_precision3():
    # ostream precision(3) general formatting
    line = report_line("pos_0", "FOUND", 39.5416, 4, 0)
    assert line == ("pos_0                         "
                    "FOUND          "
                    "39.5                      "
                    "4           "
                    "0           \n")
    # integral average renders without decimal point (like C++ '38')
    line = report_line("x", "FOUND", 38.0, 4, 0)
    assert line.split()[2] == "38"


def test_ks_header_contains_threshold():
    h = ks_report_header(0.10456)
    assert h.startswith("read id:")
    assert "avg ks-stat (thr=" in h
    assert "0.1046" in h  # precision(4) general


def test_values_record_unsigned_underflow():
    buf = io.StringIO()
    write_values_record(buf, "r1", np.array([3, 0, -1, -2], dtype=np.int64))
    assert buf.getvalue() == (
        ">r1\n3 0 18446744073709551615 18446744073709551614 \n")
