#!/usr/bin/env python3
"""Handcraft a SAS Transport (.xpt, V5) golden fixture for XptSpec,
validated by pandas.read_sas(format="xport") — an independent public
implementation of the publicly documented layout (SAS Technical Note
TS-140). Same anchoring as the sas7bdat fixtures: these bytes parse
correctly OUTSIDE this repo before they are checked in.

Emits under src/test/resources/xpt/: fixture.xpt + golden.csv
"""
import io
import math
import os
import struct
import sys

import pandas as pd

# the LAST row's name fills its 10-byte field exactly: the xport
# trailing-pad heuristic (pandas scans the final 80-byte card for
# aligned all-blank words) would otherwise swallow a real row whose
# tail is spaces
def _name(i: int) -> str:
    if i == 9:
        return ""
    if i == 17:
        return "lastrow_17"
    return f"x{i % 5}_{i}"


# no exact 0.0 anywhere: pandas' IBM decode has a known quirk (it
# never special-cases the all-zero pattern, decoding it as 16^-65-ish)
# so zeros can't be pandas-validated; XptSpec covers zero separately
# against the Scala reader's spec-correct special case.
ROWS = [
    (float(i + 1), None if i == 6 else i * 0.25 - 0.125, _name(i))
    for i in range(18)
]
COLS = [("ID", 1, 8), ("SCORE", 1, 8), ("NAME", 2, 10)]  # type 1 num, 2 char


def ibm(x) -> bytes:
    """IEEE double -> 8-byte big-endian IBM System/360 float."""
    if x is None:
        return b"." + b"\x00" * 7  # SAS missing '.'
    if x == 0.0:
        return b"\x00" * 8
    sign = 0x80 if x < 0 else 0
    x = abs(x)
    f, k = math.frexp(x)  # x = f * 2^k, 0.5 <= f < 1
    h = (k + 3) // 4      # smallest h with 16^h >= 2^k
    m = f * 2.0 ** (k - 4 * h)  # 1/16 <= m < 1
    mant = int(round(m * 2.0 ** 56))
    if mant >= 2 ** 56:
        mant >>= 4
        h += 1
    return bytes([sign | (h + 64)]) + mant.to_bytes(7, "big")


def rec(s: bytes) -> bytes:
    assert len(s) <= 80, len(s)
    return s + b" " * (80 - len(s))


def header_line(kind: bytes, tail: bytes) -> bytes:
    body = b"HEADER RECORD*******" + kind + b" HEADER RECORD!!!!!!!" + tail
    return rec(body)


def namestr(ntype: int, varnum: int, length: int, name: bytes,
            pos: int) -> bytes:
    out = struct.pack(">hhhh", ntype, 0, length, varnum)
    out += name.ljust(8)
    out += b" " * 40          # label
    out += b" " * 8           # format name
    out += struct.pack(">hhh", 0, 0, 0)  # fl, fd, fj
    out += b"  "              # fill
    out += b" " * 8           # informat
    out += struct.pack(">hh", 0, 0)
    out += struct.pack(">l", pos)
    out += b" " * 52
    assert len(out) == 140, len(out)
    return out


def build() -> bytes:
    ts = b"16AUG26:00:00:00"
    out = b""
    out += header_line(b"LIBRARY", b"0" * 30)
    out += rec(b"SAS     SAS     SASLIB  6.06    bsd4.2" + b" " * 26 + ts)
    out += rec(ts)
    out += header_line(
        b"MEMBER ", b"000000000000000001600000000140  ")
    out += header_line(b"DSCRPTR", b"0" * 30)
    out += rec(b"SAS     GRAFTFIXSASDATA 6.06    bsd4.2" + b" " * 26 + ts)
    out += rec(ts)
    out += header_line(b"NAMESTR", b"0" * 6 + b"%04d" % len(COLS) + b"0" * 20)
    ns = b""
    pos = 0
    for i, (name, typ, width) in enumerate(COLS):
        ns += namestr(typ, i + 1, width, name.encode(), pos)
        pos += width
    pad = (80 - len(ns) % 80) % 80
    out += ns + b" " * pad
    out += header_line(b"OBS    ", b"0" * 30)
    data = b""
    for rid, score, name in ROWS:
        data += ibm(rid) + ibm(score)
        data += name.encode().ljust(10)
    pad = (80 - len(data) % 80) % 80
    out += data + b" " * pad
    return out


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/xpt"
    os.makedirs(out_dir, exist_ok=True)
    raw = build()
    df = pd.read_sas(io.BytesIO(raw), format="xport", encoding="utf-8")
    assert list(df.columns) == [c for c, _, _ in COLS], df.columns
    assert len(df) == len(ROWS), len(df)
    for i, (rid, score, name) in enumerate(ROWS):
        assert df.iloc[i]["ID"] == rid, (i, df.iloc[i]["ID"])
        got = df.iloc[i]["SCORE"]
        if score is None:
            assert pd.isna(got), (i, got)
        else:
            assert abs(got - score) < 1e-12, (i, got, score)
        assert df.iloc[i]["NAME"] == name, (i, df.iloc[i]["NAME"])
    print(f"pandas xport reads {len(df)} rows OK")
    with open(f"{out_dir}/fixture.xpt", "wb") as f:
        f.write(raw)
    df.to_csv(f"{out_dir}/golden.csv", index=False)
    print(f"wrote fixtures to {out_dir}")


if __name__ == "__main__":
    main()
