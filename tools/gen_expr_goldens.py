#!/usr/bin/env python3
"""Golden generator for ExpressionFixtureSpec.

Reproduces the expected values of the reference's expression fixtures
(reference python/pathway/tests/expressions/test_datetimes.py) using the SAME
comparator those tests use (pandas), at the engine's documented µs precision:
inputs are truncated ns→µs BEFORE computing expectations, so the goldens pin
the µs-grid contract of the Spark kernels.

Driver-side tooling only (like tools/check.py): the library itself never
imports pandas.
"""
import os
import pandas as pd
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "expr_goldens")
os.makedirs(OUT, exist_ok=True)


def us_of(ts: pd.Timestamp) -> int:
    v = ts.value  # ns since epoch (UTC for tz-aware)
    return v // 1000 if v >= 0 else -((-v + 999) // 1000)  # floor toward -inf


def floor_us(ts: pd.Timestamp) -> pd.Timestamp:
    return pd.Timestamp(us_of(ts) * 1000, tz=ts.tz)


# ── test_date_time / test_weekday field accessors ───────────────────────────
DT_DATA = [
    "1960-02-03 08:00:00.000000000",
    "1960-02-03 08:00:00.123456789",
    "2008-02-29 08:00:00.000000000",
    "2023-03-25 12:00:00.000000000",
    "2023-03-25 12:00:00.000000001",
    "2023-03-25 12:00:00.123456789",
    "2023-03-25 16:43:21.000123000",
    "2023-03-25 17:00:01.987000000",
    "2023-03-25 22:59:59.999999999",
    "2023-03-25 23:00:00.000000001",
    "2023-03-25 23:59:59.999999999",
    "2023-03-26 00:00:00.000000001",
    "2023-03-26 12:00:00.000000001",
    "2123-03-26 12:00:00.000000001",
    "2123-03-31 23:00:00.000000001",
]

rows = []
for kind in ("naive", "utc"):
    data = DT_DATA if kind == "naive" else [d + "-02:00" for d in DT_DATA[:-2]]
    fmt = "%Y-%m-%d %H:%M:%S.%f" + ("%z" if kind == "utc" else "")
    for s in data:
        ts = pd.to_datetime(s, format=fmt)
        if kind == "utc":
            ts = ts.tz_convert("UTC")
        t = floor_us(ts)
        fields = {
            "nanosecond": t.nanosecond + t.microsecond * 1000,
            "microsecond": t.microsecond,
            "millisecond": t.microsecond // 1000,
            "second": t.second, "minute": t.minute, "hour": t.hour,
            "day": t.day, "month": t.month, "year": t.year,
            "weekday": t.weekday(),
        }
        for f, v in fields.items():
            rows.append((kind, us_of(ts), f, v))
with open(os.path.join(OUT, "dt_fields.tsv"), "w") as fh:
    for r in rows:
        fh.write("\t".join(map(str, r)) + "\n")

# ── test_strftime ────────────────────────────────────────────────────────────
SF_DATA = [
    "1960-02-03 08:00:00.000000000",
    "2008-02-29 08:00:00.000000000",
    "2023-03-25 12:00:00.000000000",
    "2023-03-25 12:00:00.000000001",
    "2023-03-25 12:00:00.123456789",
    "2023-03-25 16:43:21.000123000",
    "2023-03-25 17:00:01.987000000",
    "2023-03-25 23:59:59.999999999",
    "2023-03-26 01:59:59.999999999",
    "2023-03-26 03:00:00.000000001",
    "2023-03-26 04:00:00.000000001",
    "2023-03-26 12:00:00.000000001",
    "2123-03-26 12:00:00.000000001",
]
FMTS = ["%a", "%A", "%w", "%d", "%b", "%B", "%m", "%y", "%Y", "%H", "%I", "%p",
        "%M", "%S", "%f", "%z", "%j", "%U", "%W", "%c", "%x", "%X", "%%%Y",
        "%G", "%u", "%V", "%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S.%%f",
        "%%H:%%M:%%S"]

rows = []
for kind in ("naive", "utc"):
    data = SF_DATA if kind == "naive" else [d + "-02:00" for d in SF_DATA]
    fmt_in = "%Y-%m-%d %H:%M:%S.%f" + ("%z" if kind == "utc" else "")
    for s in data:
        ts = pd.to_datetime(s, format=fmt_in)
        if kind == "utc":
            ts = ts.tz_convert("UTC")
        t = floor_us(ts)
        for fmt_out in FMTS:
            if "%z" in fmt_out and kind == "naive":
                continue  # reference xfail
            expected = t.strftime(fmt_out)
            fmt_pw = fmt_out.replace("%f", "%6f").replace("%%6f", "%%f")
            rows.append((kind, us_of(ts), fmt_pw, expected))
with open(os.path.join(OUT, "strftime.tsv"), "w") as fh:
    for r in rows:
        fh.write("\t".join(map(str, r)) + "\n")

# ── test_strptime_naive ──────────────────────────────────────────────────────
SP_NAIVE = [
    (["1960-02-03", "2023-03-25", "2023-03-26", "2123-03-26"], "%Y-%m-%d"),
    (["03.02.1960", "25.03.2023", "26.03.2023", "26.03.2123"], "%d.%m.%Y"),
    (["02.03.1960", "03.25.2023", "03.26.2023", "03.26.2123"], "%m.%d.%Y"),
    (["12:34:00", "01:22:12", "13:00:34", "23:59:59"], "%H:%M:%S"),
    (["12:34:00 PM", "01:22:12 AM", "01:00:34 PM", "11:59:59 PM"], "%I:%M:%S %p"),
    (["12:34:00.000000000", "01:22:12.123456789", "13:00:34.111111111"], "%H:%M:%S.%f"),
    (["2023-03-25 16:43:21", "2023-03-26 16:43:21"], "%Y-%m-%d %H:%M:%S"),
    (["2023-03-25T16:43:21", "2023-03-26T16:43:21"], "%Y-%m-%dT%H:%M:%S"),
    (["2023-03-25 04:43:21 AM", "2023-03-26 04:43:21 PM"], "%Y-%m-%d %I:%M:%S %p"),
    (["1900-01-01 00:00:00.396", "1900-01-01 00:00:00.396093123",
      "2023-03-25 16:43:21.123456789", "2023-03-26 16:43:21.123456789",
      "2023-03-26 16:43:21.12"], "%Y-%m-%d %H:%M:%S.%f"),
    (["1900-01-01 %f00:00:00.396", "1900-01-01 %f00:00:00.396093123",
      "2023-03-25 %f16:43:21.123456789", "2023-03-26 %f16:43:21.123456789",
      "2023-03-26 %f16:43:21.12"], "%Y-%m-%d %%f%H:%M:%S.%f"),
]
rows = []
for data, fmt in SP_NAIVE:
    for s in data:
        ts = pd.to_datetime(s, format=fmt)
        rows.append((s, fmt, us_of(ts)))
with open(os.path.join(OUT, "strptime_naive.tsv"), "w") as fh:
    for r in rows:
        fh.write("\t".join(map(str, r)) + "\n")

# ── test_strptime_time_zone_aware ────────────────────────────────────────────
SP_UTC = [
    (["2023-03-25 16:43:21+0123", "2023-03-26 16:43:21+0123"], "%Y-%m-%d %H:%M:%S%z"),
    (["2023-03-25 16:43:21+01:23", "2023-03-26 16:43:21+01:23"], "%Y-%m-%d %H:%M:%S%:z"),
    (["2023-03-25T16:43:21+01:23", "2023-03-26T16:43:21+01:23"], "%Y-%m-%dT%H:%M:%S%z"),
    (["2023-03-25 04:43:21 AM +01:23", "2023-03-26 04:43:21 PM +01:23"],
     "%Y-%m-%d %I:%M:%S %p %z"),
    (["1900-01-01 00:00:00.396-11:05", "1900-01-01 00:00:00.396093123-11:05",
      "2023-03-25 16:43:21.123456789-11:05", "2023-03-26 16:43:21.123456789-11:05",
      "2023-03-26 16:43:21.12-11:05"], "%Y-%m-%d %H:%M:%S.%f%z"),
    (["1900%f01-01 00:00:00.396-11:05", "1900%f01-01 00:00:00.396093123-11:05",
      "2023%f03-25 16:43:21.123456789-11:05", "2023%f03-26 16:43:21.123456789-11:05",
      "2023%f03-26 16:43:21.12-11:05"], "%Y%%f%m-%d %H:%M:%S.%f%z"),
]
rows = []
for data, fmt in SP_UTC:
    pandas_fmt = fmt.replace("%:z", "%z")
    for s in data:
        ts = pd.to_datetime(s, format=pandas_fmt)
        rows.append((s, fmt, us_of(ts.tz_convert("UTC"))))
with open(os.path.join(OUT, "strptime_utc.tsv"), "w") as fh:
    for r in rows:
        fh.write("\t".join(map(str, r)) + "\n")

# ── test_date_time_round (round/floor, µs-truncated inputs) ──────────────────
RD_DATA = [
    "2020-03-04 11:13:00.345612",
    "2020-03-04 12:13:00.345612",
    "2020-03-04 12:00:00.0",
    "2020-03-04 11:59:59.999999999",
    "2020-03-04 13:22:23.0",
    "2023-05-19 13:56:23.0",
    "2023-05-19 13:56:23.123456789",
    "2023-05-01 09:10:11.121314",
]
ROUND_TOS = [
    ("ns:%d" % pd.Timedelta(days=1).value, pd.Timedelta(days=1)),
    ("ns:%d" % pd.Timedelta(hours=2).value, pd.Timedelta(hours=2)),
    ("ns:%d" % pd.Timedelta(hours=1).value, pd.Timedelta(hours=1)),
    ("ns:%d" % pd.Timedelta(minutes=20).value, pd.Timedelta(minutes=20)),
    ("ns:%d" % pd.Timedelta(minutes=1).value, pd.Timedelta(minutes=1)),
    ("ns:%d" % pd.Timedelta(seconds=1).value, pd.Timedelta(seconds=1)),
    ("ns:%d" % pd.Timedelta(minutes=43).value, pd.Timedelta(minutes=43)),
    ("ns:%d" % pd.Timedelta(seconds=19).value, pd.Timedelta(seconds=19)),
    ("D", pd.Timedelta("1D")), ("2H3T", pd.Timedelta(hours=2, minutes=3)),
    ("min", pd.Timedelta("1min")), ("S", pd.Timedelta("1s")),
    ("14L22ms14us", pd.Timedelta(microseconds=36014)),
    ("U", pd.Timedelta("1us")), ("N", pd.Timedelta("1ns")),
]
rows = []
for s in RD_DATA:
    ts = floor_us(pd.to_datetime(s, format="%Y-%m-%d %H:%M:%S.%f"))
    for spec, freq in ROUND_TOS:
        for method in ("round", "floor"):
            expected = getattr(ts, method)(freq)
            rows.append((method, us_of(ts), spec, us_of(expected)))
with open(os.path.join(OUT, "round_floor.tsv"), "w") as fh:
    for r in rows:
        fh.write("\t".join(map(str, r)) + "\n")

print("goldens written to", OUT)

# ── tests/test_operators.py matrices (r16): int / float / mixed arithmetic ──
INT_PAIRS = [
    (-2, 0), (-1, 3), (0, 1), (1, 10), (2, -9), (3, 8), (4, -7), (5, 6),
    (-331399, -227463), (253173, -207184), (-741012, -856821),
    (-935893, 341112), (-284786, -559808), (825347, 802488),
    (-778696, 740473), (-763723, 431098), (-980333, 562122),
    (12035, 846654), (490378, -106109), (-93465, -348397),
    (262849, -473516), (908064, 450927), (217134, 217134), (10, 10),
    (-10, -3), (-10, 3), (10, -3), (10, 3),
]
POW_SHIFT_PAIRS = [
    (0, 1), (0, 2), (0, 63), (1, 0), (1, 1), (1, 2), (1, 3), (1, 62),
    (2, 0), (2, 1), (2, 2), (2, 61), (3, 0), (3, 1), (3, 2), (3, 39),
    (4, 0), (4, 1), (4, 31), (9, 18), (10, 18), (14, 16), (23, 13),
    (-1, 0), (-1, 1), (-1, 2), (-1, 3), (-1, 62), (-1, 63),
    (-2, 0), (-2, 1), (-2, 2),
]
FLOAT_PAIRS = [
    (-2.0, 1.0), (-1.0, 3.0), (0.0, 1.0), (1.0, 10.0), (2.0, -9.0),
    (3.0, 8.0), (4.0, -7.0),
    (-0.90912489, -0.16098464), (-0.52092329, -0.21976854),
    (-0.33810194, -0.52811729), (-0.57169316, -0.02546098),
    (1.5, 1.0), (1.5, -1.0), (1.5, -2.0), (1.5, 2.0), (0.69213224, -10.3),
]  # zero divisors pre-masked to 1.0 like the reference test does for div ops


def bits(x: float) -> int:
    return int(np.float64(x).view(np.int64))


rows = []
for a, b in INT_PAIRS:
    bb = 1 if b == 0 else b  # reference masks zero divisors for div ops
    a64, b64 = np.int64(a), np.int64(bb)
    rows.append((a, bb, "floordiv", int(a64 // b64)))
    rows.append((a, bb, "mod", int(a64 % b64)))
    rows.append((a, bb, "truediv_bits", bits(a64 / b64)))
    rows.append((a, b, "and", int(np.int64(a) & np.int64(b))))
    rows.append((a, b, "or", int(np.int64(a) | np.int64(b))))
    rows.append((a, b, "xor", int(np.int64(a) ^ np.int64(b))))
for a, b in POW_SHIFT_PAIRS:
    with np.errstate(all="ignore"):
        rows.append((a, b, "pow", int(np.int64(a) ** np.int64(b))))
        rows.append((a, b, "lshift", int(np.int64(a) << np.int64(b))))
        rows.append((a, b, "rshift", int(np.int64(a) >> np.int64(b))))
with open(os.path.join(OUT, "ops_int.tsv"), "w") as fh:
    for r in rows:
        fh.write("\t".join(map(str, r)) + "\n")

rows = []
for a, b in FLOAT_PAIRS:
    af, bf = np.float64(a), np.float64(b)
    # reference float floordiv is (l/r).floor() (expression.rs:1161) — NOT
    # numpy's divmod-corrected //; identical on these pairs, but generate
    # from the decoded formula so extreme-ratio additions stay faithful
    rows.append((bits(a), bits(b), "floordiv", bits(np.floor(af / bf))))
    rows.append((bits(a), bits(b), "mod", bits(af % bf)))
    rows.append((bits(a), bits(b), "truediv", bits(af / bf)))
    # mixed int/float: int(a) op float(b), both directions — the reference's
    # widening route (test_mixed_int_float)
    ai = np.int64(int(a))
    rows.append((int(ai), bits(b), "mixed_floordiv", bits(np.floor(ai / bf))))
    rows.append((int(ai), bits(b), "mixed_mod", bits(ai % bf)))
    rows.append((int(ai), bits(b), "mixed_truediv", bits(ai / bf)))
with open(os.path.join(OUT, "ops_float.tsv"), "w") as fh:
    for r in rows:
        fh.write("\t".join(map(str, r)) + "\n")

print("operator goldens written")

# ── tests/test_operators.py: duration / datetime / string matrices (r16) ─────
# Expected values computed exactly as the reference tests do (python/pandas
# scalar ops — the engine's own comparator), durations at full ns, datetimes
# on the documented µs grid (inputs floor-truncated BEFORE the op, per D1).
import hashlib

DUR_PAIRS_NS = [
    (0, 0), (1, 0), (0, 1), (2, 1), (2, 0), (2, -1), (-2, -2),
    (-331399, -227463), (253173, -207184), (-741012, -856821),
    (-935893, 341112), (-284786, -559808), (825347, 802488),
    (-778696, 740473), (-763723, 431098), (-980333, 562122),
    (10**6, 2 * 10**6), (-2 * 10**6, 3 * 10**6),
    (10**9, 2 * 10**9), (-2 * 10**9, 3 * 10**9),
    (60 * 10**9, 120 * 10**9), (-120 * 10**9, 180 * 10**9),
    (3600 * 10**9, 7200 * 10**9), (-7200 * 10**9, 10800 * 10**9),
    (86400 * 10**9, 2 * 86400 * 10**9), (-2 * 86400 * 10**9, 3 * 86400 * 10**9),
    (7 * 86400 * 10**9, 14 * 86400 * 10**9), (-14 * 86400 * 10**9, 21 * 86400 * 10**9),
    (7 * 86400 * 10**9, 2 * 10**9), (-14 * 86400 * 10**9, 3 * 10**9),
]

def bits(x) -> int:
    return int(np.float64(x).view(np.int64))

rows = []
for a, b in DUR_PAIRS_NS:
    rows.append((a, b, "add", a + b))
    rows.append((a, b, "sub", a - b))
    bb = 1 if b == 0 else b  # reference masks zero divisors for div ops
    rows.append((a, bb, "floordiv", a // bb))            # -> int (div_floor)
    rows.append((a, bb, "mod", a % bb))                  # -> duration (mod_floor)
    rows.append((a, bb, "truediv_bits", bits(np.float64(a) / np.float64(bb))))
with open(os.path.join(OUT, "ops_duration.tsv"), "w") as fh:
    for r in rows:
        fh.write("\t".join(map(str, r)) + "\n")

DUR_INT_PAIRS = [
    (0, 0), (1, 0), (0, 1), (2, 1), (2, 0), (2, -1), (-2, -2),
    (10, 3), (10, -3), (-10, 3), (-10, -3),
    (11, 3), (11, -3), (-11, 3), (-11, -3),
    (-331399, -227463), (253173, -207184), (-741012, -856821),
    (-935893, 341112), (-284786, -559808), (825347, 802488),
    (-778696, 740473), (-763723, 431098), (-980333, 562122),
    (10**6, -96), (-2 * 10**6, 88), (10**9, -3), (-2 * 10**9, -60),
    (60 * 10**9, 54), (-120 * 10**9, 44), (3600 * 10**9, -31),
    (-7200 * 10**9, 60), (86400 * 10**9, -91), (-2 * 86400 * 10**9, 28),
    (7 * 86400 * 10**9, -90), (-14 * 86400 * 10**9, -65),
    (7 * 86400 * 10**9, 10), (-14 * 86400 * 10**9, -45),
]

rows = []
for a, b in DUR_INT_PAIRS:
    rows.append((a, b, "mul_int", int((pd.Timedelta(a) * int(b)).value)))
    bb = 1 if b == 0 else b
    rows.append((a, bb, "floordiv_int", int((pd.Timedelta(a) // int(bb)).value)))
    rows.append((a, bb, "truediv_int", int((pd.Timedelta(a) / int(bb)).value)))
    rows.append((a, b, "mul_float", int((pd.Timedelta(a) * float(b)).value)))
    rows.append((a, bb, "truediv_float", int((pd.Timedelta(a) / float(bb)).value)))
with open(os.path.join(OUT, "ops_duration_int.tsv"), "w") as fh:
    for r in rows:
        fh.write("\t".join(map(str, r)) + "\n")

# datetime ± duration / datetime − datetime, naive + utc — µs-grid inputs
DT_DUR_PAIRS = [
    ("1960-02-03 08:00:00.000000000", -1),
    ("2008-02-29 08:00:00.000000000", 1),
    ("2023-03-25 12:00:00.000000000", 825347),
    ("2023-03-25 12:00:00.000000001", 249333862623082067),
    ("2023-03-25 12:00:00.123456789", -462593511970998050),
    ("2023-03-25 16:43:21.123456788", 3 * 86400 * 10**9),
    ("2023-03-25 16:43:21.123456789", 20 * 3600 * 10**9),
    ("2023-03-25 17:00:01.987000000", 12 * 7 * 86400 * 10**9),
    ("2023-03-25 18:43:21.123456789", -10 * 86400 * 10**9),
    ("2023-03-25 22:59:59.999999999", -34 * 3600 * 10**9),
    ("2023-03-25 23:00:00.000000001", -3 * 60 * 10**9),
    ("2023-03-25 23:59:59.999999999", 1),
    ("2023-03-26 00:00:00.000000001", -1345),
    ("2023-03-26 01:59:59.999999999", -3600 * 10**9),
    ("2023-03-26 01:59:59.999999999", -2),
    ("2023-03-26 01:59:59.999999999", -1),
    ("2023-03-26 01:59:59.999999999", 1),
    ("2023-03-26 01:59:59.999999999", 2),
    ("2023-03-26 01:59:59.999999999", 3600 * 10**9),
    ("2023-03-26 03:00:00.000000001", -3600 * 10**9),
    ("2023-03-26 03:00:00.000000001", -2),
    ("2023-03-26 03:00:00.000000001", -1),
    ("2023-03-26 03:00:00.000000001", 1),
    ("2023-03-26 03:00:00.000000001", 3600 * 10**9),
    ("2023-03-26 12:00:00.000000001", 10**9),
    ("2123-03-26 12:00:00.000000001", -971716231 * 10**9),
    ("2123-03-31 23:00:00.000000001", 0),
]

rows = []
for s, d in DT_DUR_PAIRS:
    for kind in ("naive", "utc"):
        t = pd.Timestamp(s, tz=("UTC" if kind == "utc" else None))
        t_us = us_of(t)                       # µs-grid input
        exact_add = t_us * 1000 + d           # reference ns result on µs input
        exact_sub = t_us * 1000 - d
        rows.append((kind, t_us, d, "add_us", exact_add // 1000))
        rows.append((kind, t_us, d, "sub_us", exact_sub // 1000))
with open(os.path.join(OUT, "ops_datetime_duration.tsv"), "w") as fh:
    for r in rows:
        fh.write("\t".join(map(str, r)) + "\n")

# datetime − datetime and comparisons, on µs-truncated inputs (test_date_time)
DT_PAIRS = [
    ("1960-02-03 08:00:00.000000000", "2023-03-25 16:43:21.123456789"),
    ("2008-02-29 08:00:00.000000000", "2023-03-25 16:43:21.123456789"),
    ("2023-03-25 12:00:00.000000000", "2023-03-25 16:43:21.123456789"),
    ("2023-03-25 12:00:00.000000001", "2023-03-25 16:43:21.123456789"),
    ("2023-03-25 12:00:00.123456789", "2023-03-25 16:43:21.123456789"),
    ("2023-03-25 16:43:21.123456788", "2023-03-25 16:43:21.123456789"),
    ("2023-03-25 16:43:21.123456789", "2023-03-25 16:43:21.123456789"),
    ("2023-03-25 17:00:01.987000000", "2023-03-25 16:43:21.123456789"),
    ("2023-03-25 18:43:21.123456789", "2023-03-25 16:43:21.123456789"),
    ("2023-03-25 22:59:59.999999999", "2023-03-25 16:43:21.123456789"),
    ("2023-03-25 23:00:00.000000001", "2023-03-25 16:43:21.123456789"),
    ("2023-03-25 23:59:59.999999999", "2023-03-25 16:43:21.123456789"),
    ("2023-03-26 00:00:00.000000001", "2023-03-25 16:43:21.123456789"),
    ("2023-03-26 12:00:00.000000001", "2023-03-25 16:43:21.123456789"),
    ("2123-03-26 12:00:00.000000001", "2023-03-25 16:43:21.123456789"),
    ("2123-03-31 23:00:00.000000001", "2023-03-25 16:43:21.123456789"),
]

rows = []
for sa, sb in DT_PAIRS:
    for kind in ("naive", "utc"):
        # utc variant shifts like the reference test (+01:30 / -00:30)
        if kind == "utc":
            a = pd.Timestamp(sa + "+01:30")
            b = pd.Timestamp(sb + "-00:30")
        else:
            a = pd.Timestamp(sa)
            b = pd.Timestamp(sb)
        ua, ub = us_of(a), us_of(b)
        rows.append((kind, ua, ub, "sub_ns", (ua - ub) * 1000))
        for op, f in (("lt", ua < ub), ("le", ua <= ub), ("gt", ua > ub),
                      ("ge", ua >= ub), ("eq", ua == ub), ("ne", ua != ub)):
            rows.append((kind, ua, ub, op, f))
with open(os.path.join(OUT, "ops_datetime.tsv"), "w") as fh:
    for r in rows:
        fh.write("\t".join(map(str, r)) + "\n")

# string mul (python repetition; huge results stored as len:md5)
STR_MUL_PAIRS = [
    ("", 0), ("", 1), ("", 2), ("", -1), ("a", 0), ("a", 1), ("a", 2),
    ("a", 10), ("a", -10), ("aaaaa", 0), ("aaaaa", 20), ("aaaaa", -20),
    ("jnbewoifnq", 13), ("123", 2), ("321", 10), ("oemcoejo", 1000000),
    ("oemcoejo", 999999), ("/**/", 1000001), ('E iRR5}KPtz$R$"t&mMW', 4),
    ("*e[mX%rhI(p<.X", 3), ("(`-=,~j?uA_E-'{4", 4213),
    ("{rC3#?y7AB{)pL>%[A(", 532), ("5I^We<N.KfQ3fH#@c)~", 214),
    ("B|vQL!!MSaZ(n%K;q%:", -10), ('z0U\\?jmoz_.+1W"Y[OIv', 5),
    ("g{:", 12345), ("HV", 54321), ("D$<edj8m@L-", 0),
    ('z0U\\?jmoz_.+1W"Y[OIv', 2000000),
]

rows = []
for s, n in STR_MUL_PAIRS:
    r = s * n
    if len(r) > 4096:
        enc = "len:%d:md5:%s" % (len(r), hashlib.md5(r.encode()).hexdigest())
    else:
        enc = "lit:" + r
    rows.append((s.replace("\t", "\\t"), n, enc))
with open(os.path.join(OUT, "ops_string_mul.tsv"), "w") as fh:
    for r in rows:
        fh.write("\t".join(map(str, r)) + "\n")

print("operator-matrix goldens written (duration/datetime/string)")
