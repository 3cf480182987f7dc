#!/usr/bin/env python3
"""Write Stata .dta golden fixtures for DtaSpec with pandas.to_stata —
the REAL producer (pandas is an independent public implementation of
the publicly documented .dta format, www.stata.com/help.cgi?dta).
Emits the same logical frame in format 114 (classic), 117 and 118
(modern tagged), so the Scala reader is pinned against every release
it claims, plus a golden CSV of what pandas itself reads back.

Under src/test/resources/dta/:
  fixture_114.dta  fixture_117.dta  fixture_118.dta  golden.csv
"""
import os
import sys

import numpy as np
import pandas as pd


def frame() -> pd.DataFrame:
    n = 25
    return pd.DataFrame({
        # one column per Stata numeric type + a string
        "b": pd.array([None if i == 3 else (i % 100) - 20 for i in range(n)],
                      dtype="Int8"),
        "i": pd.array([None if i == 7 else i * 300 - 2000 for i in range(n)],
                      dtype="Int16"),
        "l": pd.array([None if i == 11 else i * 100000 - 60000
                       for i in range(n)], dtype="Int32"),
        "f": np.array([np.nan if i == 15 else i * 0.25 - 1.5
                       for i in range(n)], dtype="float32"),
        "d": np.array([np.nan if i == 19 else i * 0.125 - 2.0
                       for i in range(n)], dtype="float64"),
        "s": ["" if i == 5 else f"str_{i % 7}_{i}" for i in range(n)],
    })


def strl_frame() -> pd.DataFrame:
    """k numeric, s strL (via convert_strl: empties -> (0,0) refs,
    payloads past 2045 would force strL anyway but convert_strl makes
    it explicit at any length), w a plain fixed-width string."""
    n = 24
    return pd.DataFrame({
        "k": np.arange(n, dtype="float64"),
        "s": ["" if i % 6 == 0 else f"strl_{i}_" + "q" * (i * 7 % 120)
              for i in range(n)],
        "w": [f"fix{i}" for i in range(n)],
    })


def write_strl(out_dir: str):
    df = strl_frame()
    for ver, name in ((118, "fixture_strl.dta"), (117, "fixture_strl_117.dta")):
        p = f"{out_dir}/{name}"
        df.to_stata(p, write_index=False, version=ver, convert_strl=["s"])
        back = pd.read_stata(p)
        assert len(back) == len(df), (ver, len(back))
        for i in range(len(df)):
            assert back["k"][i] == float(i)
            assert back["s"][i] == df["s"][i], (ver, i, back["s"][i])
            assert back["w"][i] == f"fix{i}"
        raw = open(p, "rb").read()
        assert b"GSO" in raw, "convert_strl did not emit GSO entries"
        print(f"{name}: pandas strL round-trip OK ({raw.count(b'GSO')} GSOs)")
    back = pd.read_stata(f"{out_dir}/fixture_strl.dta")
    back.to_csv(f"{out_dir}/golden_strl.csv", index=False)


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/dta"
    os.makedirs(out_dir, exist_ok=True)
    df = frame()
    for ver in (114, 117, 118):
        p = f"{out_dir}/fixture_{ver}.dta"
        df.to_stata(p, write_index=False, version=ver)
        back = pd.read_stata(p)
        assert len(back) == len(df), (ver, len(back))
        for c in df.columns:
            for i in range(len(df)):
                a, b = df[c][i], back[c][i]
                if c == "s":
                    assert a == b, (ver, c, i, a, b)
                elif pd.isna(a):
                    assert pd.isna(b), (ver, c, i, b)
                else:
                    assert abs(float(a) - float(b)) < 1e-6, (ver, c, i, a, b)
        print(f"fixture_{ver}.dta: pandas round-trip OK")
    pd.read_stata(f"{out_dir}/fixture_118.dta").to_csv(
        f"{out_dir}/golden.csv", index=False)
    write_strl(out_dir)
    print(f"wrote fixtures to {out_dir}")


def check_scala_113(path: str):
    """pandas reads a Dta.dumps113 file — DtaSpec's 200-row closed form
    (k double, txt str# with nulls, v double with nulls). pandas is the
    independent implementation anchoring the classic release-113 layout
    (109-byte header, byte typlist, 33-byte names, 12-byte formats)."""
    back = pd.read_stata(path)
    assert list(back.columns) == ["k", "txt", "v"], back.columns
    assert len(back) == 200, len(back)
    for i in range(200):
        assert back["k"][i] == float(i)
        t = back["txt"][i]
        if i % 5 == 0:
            assert t == "" or pd.isna(t), (i, t)
        else:
            assert t == f"dta_value_{i}", (i, t)
        v = back["v"][i]
        if i % 7 == 0:
            assert pd.isna(v), (i, v)
        else:
            assert abs(v - (i * 1.25 - 10.0)) < 1e-12, (i, v)
    print(f"{path}: pandas reads the SCALA-written release-113 file OK "
          f"({len(back)} rows)")


def check_scala_binstrl(path: str):
    """pandas reads a Dta.dumpsTyped file carrying BINARY strL (t=129):
    200 rows of DtaSpec's closed form — id double, tag text strL with
    nulls, payload binary strL read back as Python bytes."""
    back = pd.read_stata(path)
    assert list(back.columns) == ["id", "tag", "payload"], back.columns
    assert len(back) == 200, len(back)
    for i in range(200):
        assert back["id"][i] == float(i)
        tag = back["tag"][i]
        if i % 11 == 5:
            assert tag == "" or pd.isna(tag), (i, tag)
        else:
            assert tag == f"t{i % 5}", (i, tag)
        p = back["payload"][i]
        if i % 7 == 3:
            assert p in (b"", "", str(b"")) or pd.isna(p), (i, p)
        else:
            want = bytes((i + j * 13) % 256 for j in range(i % 40 + 1))
            # pandas 2.x parses t=129 payloads as bytes but stringifies
            # them into the frame — accept either form; both pin the
            # GSO layout (refs, t, len, payload) byte-for-byte
            assert p == want or p == str(want), (i, p, want)
    print(f"{path}: pandas reads the SCALA-written binary strL OK "
          f"({len(back)} rows)")


def check_scala_shared(path: str):
    """pandas reads a Dta.dumpsTyped file whose strL payloads are
    DEDUPED across columns (b2's refs point at entries first written
    for b1; t2's at t1's) — pandas must resolve the shared refs to the
    same values, pinning the cross-column sharing convention."""
    back = pd.read_stata(path)
    assert list(back.columns) == ["id", "b1", "b2", "t1", "t2"], back.columns
    assert len(back) == 60, len(back)
    for i in range(60):
        assert back["id"][i] == float(i)
        want = bytes(((i % 5) * 7 + j) % 256 for j in range(8))
        for c in ("b1", "b2"):
            p = back[c][i]
            assert p == want or p == str(want), (c, i, p, want)
        for c in ("t1", "t2"):
            assert back[c][i] == f"v{i % 4}", (c, i, back[c][i])
    print(f"{path}: pandas resolves the SHARED strL refs OK (60 rows)")


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[3] == "shared":
        check_scala_shared(sys.argv[2])
    elif len(sys.argv) > 2 and sys.argv[1] == "check-113":
        check_scala_113(sys.argv[2])
    elif len(sys.argv) > 2:
        check_scala_binstrl(sys.argv[2])
    else:
        main()
