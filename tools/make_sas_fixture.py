#!/usr/bin/env python3
"""Handcraft sas7bdat golden fixtures for SasSpec, validated by pandas.

The sas7bdat layout followed here is the publicly reverse-engineered
one (the BioStatMatt sas7bdat vignette / the parso and pandas readers).
pandas.read_sas is an INDEPENDENT public implementation: this script
asserts that the bytes it emits parse to exactly the intended frame
before writing them, so the checked-in fixtures conform to the format
as implemented outside this repo, not merely to our own Scala parser.

The RLE fixture exercises every compression op the Scala writer emits
(zero/space fills short+long, byte repeats, literal copies short+long,
and the raw-at-rowLength fallback); pandas decoding the golden values
is the empirical proof of those ops' semantics — the compressor here
is a second implementation kept deliberately separate from Sas.scala.

Emits (under src/test/resources/sas/):
  fixture_u64.sas7bdat    64-bit little-endian, uncompressed, 2 pages
  fixture_x86.sas7bdat    32-bit little-endian, uncompressed, 1 mix page
  fixture_rle.sas7bdat    64-bit little-endian, RLE (SASYZCRL), 2+ pages
  fixture_rdc.sas7bdat    64-bit little-endian, RDC (SASYZCR2), 2+ pages
  golden.csv              the pandas-read values of the uncompressed pair
  golden_rle.csv          the pandas-read values of the RLE fixture
  golden_rdc.csv          the pandas-read values of the RDC fixture
"""
import io
import struct
import sys

import pandas as pd

MAGIC = bytes([
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0xC2, 0xEA, 0x81, 0x60,
    0xB3, 0x14, 0x11, 0xCF, 0xBD, 0x92, 0x08, 0x00,
    0x09, 0xC7, 0x31, 0x8C, 0x18, 0x1F, 0x10, 0x11,
])
SAS_MISSING = bytes([0, 0, 0, 0, 0, 0, 0xFF, 0xFF])  # LE NaN, SAS "."

# the intended frame: id f8, score f8 (one missing), name char(8)
ROWS = [
    (float(i),
     None if i == 7 else round(i * 0.5 - 3.0, 6),
     f"r{i % 3}x" if i % 4 else "pad  ".strip())
    for i in range(20)
]
COLS = [("id", "d", 8), ("score", "d", 8), ("name", "s", 8)]

# the RLE frame: long space-padded and zero-heavy cells force fills,
# a char(90) cell forces long-literal copies, run cells force repeats,
# and one high-entropy row lands on the raw (incompressible) fallback
RLE_ROWS = [
    # row 13 is dense in EVERY byte (no run >= 2, no zero/space bytes
    # in the doubles, full-width varied strings): its compressed form
    # is >= row_len, forcing the raw-at-rowLength fallback path
    (13.137137137, 13.731731731, 31.137137137, 1013.7731137,
     "".join(chr(65 + (j * 11) % 26) for j in range(90)),
     "".join(chr(97 + (j * 7) % 26) for j in range(16)))
    if i == 13 else
    # z1/z2 sit right after id: on i%6==0 rows all three are 0.0 and
    # the 24-zero run forces the LONG zero fill (0x70)
    (float(i),
     0.0 if i % 6 == 0 else i * 1.5 + 0.125,
     0.0 if i % 6 == 0 else i * 2.5 + 0.125,
     None if i % 7 == 3 else round(i * 0.25 - 2.0, 6),
     ("z" * 90 if i % 5 == 0 else
      "".join(chr(65 + (i * 7 + j * 11) % 26) for j in range(90))
      if i % 5 == 1 else f"w{i}"),
     "x" * (i % 12))
    for i in range(60)
]
RLE_COLS = [("id", "d", 8), ("z1", "d", 8), ("z2", "d", 8),
            ("score", "d", 8), ("blob", "s", 90), ("tag", "s", 16)]


def pad(b: bytes, n: int) -> bytes:
    assert len(b) <= n, (len(b), n)
    return b + b"\x00" * (n - len(b))


def encode_row(cols, row) -> bytes:
    out = b""
    for (name, typ, width), v in zip(cols, row):
        if typ == "d":
            out += SAS_MISSING if v is None else struct.pack("<d", v)
        else:
            out += pad(v.encode("ascii"), width).replace(b"\x00", b" ")
    return out


def rle_compress(row: bytes) -> bytes:
    """The SASYZCRL op subset the Scala writer uses, re-implemented
    independently: zero/space fills, byte repeats, literal copies."""
    out = bytearray()
    lit_start = 0

    def flush_literal(until):
        at = lit_start
        while at < until:
            n = min(until - at, 4159)
            if n <= 16:
                out.append(0x80 | (n - 1))
            elif n <= 32:
                out.append(0x90 | (n - 17))
            elif n <= 48:
                out.append(0xA0 | (n - 33))
            elif n <= 64:
                out.append(0xB0 | (n - 49))
            else:
                ext = n - 64
                out.append(ext >> 8)
                out.append(ext & 0xFF)
            out.extend(row[at:at + n])
            at += n

    i = 0
    while i < len(row):
        run = i + 1
        while run < len(row) and row[run] == row[i]:
            run += 1
        n = run - i
        b = row[i]
        is_fill = b in (0x00, 0x20)
        if (is_fill and n >= 2) or n >= 3:
            flush_literal(i)
            left = n
            while left > 0:
                if is_fill:
                    take = left if left <= 17 else min(left, 4112)
                    if left - take == 1:
                        take -= 1
                    if take <= 17:
                        out.append((0xF0 if b == 0 else 0xE0) | (take - 2))
                    else:
                        ext = take - 17
                        out.append((0x70 if b == 0 else 0x60) | (ext >> 8))
                        out.append(ext & 0xFF)
                else:
                    take = min(left, 18)
                    if 0 < left - take < 3:
                        take = left - 3
                    out.append(0xC0 | (take - 3))
                    out.append(b)
                left -= take
            lit_start = run
        i = run
    flush_literal(len(row))
    return bytes(out)


def header(u64: bool, page_size: int, page_count: int) -> bytes:
    h = bytearray(1024)
    h[0:32] = MAGIC
    a1 = 4 if u64 else 0  # byte 35 == '3' shifts the date/size fields
    a2 = 4 if u64 else 0  # byte 32 == '3' selects the 64-bit layout
    if u64:
        h[32] = 0x33
        h[35] = 0x33
    h[37] = 0x01  # little-endian
    h[39] = ord("1")  # unix
    h[70] = 20  # utf-8
    h[84:92] = b"SAS FILE"
    h[92:156] = pad(b"GRAFTFIX", 64).replace(b"\x00", b" ")
    h[156:164] = b"DATA    "
    created = struct.pack("<d", 2.0e9)  # seconds since 1960, arbitrary
    h[164 + a1:172 + a1] = created
    h[172 + a1:180 + a1] = created
    h[196 + a1:200 + a1] = struct.pack("<I", 1024)
    h[200 + a1:204 + a1] = struct.pack("<I", page_size)
    cnt_len = 8 if u64 else 4
    h[204 + a1:204 + a1 + cnt_len] = page_count.to_bytes(cnt_len, "little")
    ta = a1 + a2
    h[216 + ta:224 + ta] = b"9.0401M2"
    h[224 + ta:240 + ta] = pad(b"Linux", 16).replace(b"\x00", b" ")
    return bytes(h)


def subheaders(u64: bool, cols, n_rows: int, row_len: int, mix_rows: int,
               literal: bytes | None = None):
    """Return the metadata subheaders in the order they will be pointed
    at from the meta/mix page."""
    il = 8 if u64 else 4
    U = "<Q" if u64 else "<I"

    def sig(le32: bytes) -> bytes:
        # LE signatures: 32-bit files use the 4-byte form, 64-bit files
        # extend row/col-size with zeros and the pointer family with FF
        if not u64:
            return le32
        if le32 in (b"\xf7\xf7\xf7\xf7", b"\xf6\xf6\xf6\xf6"):
            return le32 + b"\x00\x00\x00\x00"
        return le32 + b"\xff\xff\xff\xff"

    out = []

    # --- row size: row length / row count / col count / mix rows
    rs = bytearray(808 if u64 else 480)
    rs[0:il] = sig(b"\xf7\xf7\xf7\xf7")
    rs[5 * il:6 * il] = struct.pack(U, row_len)
    rs[6 * il:7 * il] = struct.pack(U, n_rows)
    rs[9 * il:10 * il] = struct.pack(U, len(cols))   # col_count_p1
    rs[10 * il:11 * il] = struct.pack(U, 0)          # col_count_p2
    rs[15 * il:16 * il] = struct.pack(U, mix_rows)
    # lcs/lcp stay 0 -> no creator-proc / compression-literal reads
    out.append(bytes(rs))

    # --- column size
    cs = bytearray(3 * il)
    cs[0:il] = sig(b"\xf6\xf6\xf6\xf6")
    cs[il:2 * il] = struct.pack(U, len(cols))
    out.append(bytes(cs))

    # --- column text: blob starts right after the signature; name
    # pointers index into it (offset 0 = the u16 size field itself).
    # Compressed files carry the codec literal here — both pandas and
    # the Scala reader key compression on its presence in the FIRST
    # blob.
    names = [n.encode("ascii") for n, _, _ in cols]
    blob = bytearray(b"\x00" * 8)  # size u16 + pad, strings from 8
    if literal:
        blob += literal
    name_at = []
    for nb in names:
        name_at.append(len(blob))
        blob += pad(nb, (len(nb) + 7) // 8 * 8)
    struct.pack_into("<H", blob, 0, len(blob))
    out.append(sig(b"\xfd\xff\xff\xff") + bytes(blob))

    # --- column name pointers: 8 bytes each, first at sig + il + 8
    # (pandas addresses them as subheader + int_len + 8*(i+1))
    cn = bytearray(sig(b"\xff\xff\xff\xff") + b"\x00" * 8)
    for (n, _, _), off in zip(cols, name_at):
        cn += struct.pack("<HHHH", 0, off, len(n), 0)
    cn += b"\x00" * 12  # count = (len - 2*il - 12) // 8
    out.append(bytes(cn))

    # --- column attributes: (il+8)-byte vectors, first at sig + il + 8
    ca = bytearray(sig(b"\xfc\xff\xff\xff") + b"\x00" * 8)
    rowoff = 0
    for _, typ, width in cols:
        vec = bytearray(il + 8)
        vec[0:il] = struct.pack(U, rowoff)
        struct.pack_into("<I", vec, il, width)
        vec[il + 6] = 1 if typ == "d" else 2
        ca += vec
        rowoff += width
    ca += b"\x00" * 12  # count = (len - 2*il - 12) // (il + 8)
    out.append(bytes(ca))

    # --- one format-and-label subheader per column (pandas builds its
    # column list here); zero-length format and label
    for _ in cols:
        out.append(pad(sig(b"\xfe\xfb\xff\xff"), 3 * il + 40))

    return out


def build(u64: bool, split_pages: bool) -> bytes:
    il = 8 if u64 else 4
    bit_offset = 32 if u64 else 16
    ptr_len = 24 if u64 else 12
    page_size = 4096
    row_len = sum(w for _, _, w in COLS)

    mix_rows = 0 if split_pages else len(ROWS)
    shs = subheaders(u64, COLS, len(ROWS), row_len, mix_rows)

    # lay subheaders from the END of page 1 (the real-file convention),
    # 8-aligned; pointers live right after the page header
    page1 = bytearray(page_size)
    tail = page_size
    ptrs = []
    for sh in shs:
        tail = (tail - len(sh)) & ~7
        page1[tail:tail + len(sh)] = sh
        ptrs.append((tail, len(sh)))
    ptr_area = bit_offset + 8
    assert ptr_area + len(ptrs) * ptr_len <= tail, "page 1 overflow"
    for i, (off, ln) in enumerate(ptrs):
        base = ptr_area + i * ptr_len
        if u64:
            struct.pack_into("<QQBB", page1, base, off, ln, 0, 1)
        else:
            struct.pack_into("<IIBB", page1, base, off, ln, 0, 1)

    page_type = 0 if split_pages else 512  # meta vs mix
    rows_on_p1 = 0
    if not split_pages:
        data_at = bit_offset + 8 + len(ptrs) * ptr_len
        data_at += data_at % 8  # the reader's mix-page alignment rule
        for r in ROWS:
            enc = encode_row(COLS, r)
            assert data_at + len(enc) <= tail, "mix page overflow"
            page1[data_at:data_at + len(enc)] = enc
            data_at += len(enc)
        rows_on_p1 = len(ROWS)
    struct.pack_into("<HHH", page1, bit_offset,
                     page_type, len(ptrs) + rows_on_p1, len(ptrs))

    pages = [bytes(page1)]
    if split_pages:
        page2 = bytearray(page_size)
        struct.pack_into("<HHH", page2, bit_offset, 256, len(ROWS), 0)
        at = bit_offset + 8
        for r in ROWS:
            enc = encode_row(COLS, r)
            page2[at:at + len(enc)] = enc
            at += len(enc)
        pages.append(bytes(page2))

    return header(u64, page_size, len(pages)) + b"".join(pages)


def rdc_compress(row: bytes) -> bytes:
    """RDC (SASYZCR2): 16-bit big-endian control words before their 16
    items (bit 1 = command); fills (cmd 0 short / 1 long) + literals.
    Copy commands (2-15) are never emitted — not needed for a valid
    stream — but the Scala decoder handles them (probed via pandas)."""
    out = bytearray()
    items = []  # (is_cmd, bytes)

    def flush():
        if not items:
            return
        ctrl = 0
        for i, (is_cmd, _) in enumerate(items):
            if is_cmd:
                ctrl |= 0x8000 >> i
        out.append((ctrl >> 8) & 0xFF)
        out.append(ctrl & 0xFF)
        for _, bs in items:
            out.extend(bs)
        items.clear()

    def item(is_cmd, bs):
        items.append((is_cmd, bs))
        if len(items) == 16:
            flush()

    i = 0
    while i < len(row):
        run = i + 1
        while run < len(row) and row[run] == row[i]:
            run += 1
        n = run - i
        if n >= 3:
            left = n
            while left > 0:
                take = min(left, 15 + 255 * 16 + 19)  # long-fill max 4114
                if 0 < left - take < 3:
                    take -= 3
                if take <= 18:
                    item(True, bytes([take - 3, row[i]]))
                else:
                    ext = take - 19
                    item(True, bytes([0x10 | (ext & 0x0F),
                                      (ext >> 4) & 0xFF, row[i]]))
                left -= take
        else:
            for k in range(i, run):
                item(False, bytes([row[k]]))
        i = run
    flush()
    return bytes(out)


def build_compressed(literal: bytes, compress) -> bytes:
    """64-bit compressed file: meta subheaders AND one comp-4 data
    subheader per row, packed from each page's end (new page on
    overflow)."""
    u64 = True
    bit_offset = 32
    ptr_len = 24
    page_size = 2048  # small on purpose: forces multi-page packing
    row_len = sum(w for _, _, w in RLE_COLS)
    shs = subheaders(u64, RLE_COLS, len(RLE_ROWS), row_len, 0, literal)

    pages = []
    cur = bytearray(page_size)
    tail = page_size
    ptrs = []  # (off, len, comp)

    def flush():
        nonlocal cur, tail, ptrs
        struct.pack_into("<HHH", cur, bit_offset, 0, len(ptrs), len(ptrs))
        for i, (off, ln, comp) in enumerate(ptrs):
            struct.pack_into("<QQBB", cur, bit_offset + 8 + i * ptr_len,
                             off, ln, comp, 1)
        pages.append(bytes(cur))
        cur = bytearray(page_size)
        tail = page_size
        ptrs = []

    def place(payload: bytes, comp: int):
        nonlocal tail
        new_tail = (tail - len(payload)) & ~7
        if bit_offset + 8 + (len(ptrs) + 1) * ptr_len > new_tail:
            assert ptrs, "subheader exceeds a page"
            flush()
            place(payload, comp)
            return
        tail = new_tail
        cur[tail:tail + len(payload)] = payload
        ptrs.append((tail, len(payload), comp))

    for sh in shs:
        place(sh, 0)
    raw_fallbacks = 0
    for r in RLE_ROWS:
        enc = encode_row(RLE_COLS, r)
        c = compress(enc)
        if len(c) >= len(enc):  # raw at EXACTLY row_len = "uncompressed"
            place(enc, 4)
            raw_fallbacks += 1
        else:
            place(c, 4)
    flush()
    assert raw_fallbacks > 0, "fixture must exercise the raw fallback"
    assert len(pages) > 2, "fixture must span multiple pages"
    return header(u64, page_size, len(pages)) + b"".join(pages)


def validate(raw: bytes, label: str, cols, rows) -> pd.DataFrame:
    df = pd.read_sas(io.BytesIO(raw), format="sas7bdat", encoding="utf-8")
    assert list(df.columns) == [n for n, _, _ in cols], df.columns
    assert len(df) == len(rows), (label, len(df))
    for i, expect in enumerate(rows):
        for (name, typ, _), v in zip(cols, expect):
            got = df.iloc[i][name]
            if typ == "d":
                if v is None:
                    assert pd.isna(got), (label, i, name, got)
                else:
                    assert abs(got - v) < 1e-12, (label, i, name, got)
            elif v == "":
                # all-blank char cells read back as missing — the same
                # null convention the Scala reader uses
                assert pd.isna(got), (label, i, name, got)
            else:
                assert got == v, (label, i, name, got)
    print(f"{label}: pandas reads {len(df)} rows OK")
    return df


def check_scala_be(path: str):
    """pandas reads a Sas.dumps(bigEndian=true) file — SasSpec's 300-row
    closed form (k double, txt char with nulls, v double with nulls).
    pandas is the independent implementation: if our big-endian packing
    (header byte 37, file-order ints/doubles, reversed 64-bit subheader
    signatures, BE missing pattern) deviated from the real layout,
    pandas would refuse the file or read different values."""
    df = pd.read_sas(path, format="sas7bdat", encoding="utf-8")
    assert list(df.columns) == ["k", "txt", "v"], df.columns
    assert len(df) == 300, len(df)
    for i in range(300):
        assert df["k"][i] == float(i), (i, df["k"][i])
        t = df["txt"][i]
        if i % 5 == 0:
            assert pd.isna(t) or t == "", (i, t)
        else:
            assert t == f"s{i % 11}", (i, t)
        v = df["v"][i]
        if i % 7 == 0:
            assert pd.isna(v), (i, v)
        else:
            assert abs(v - (i * 1.25 - 10.0)) < 1e-12, (i, v)
    print(f"{path}: pandas reads the SCALA-written big-endian file OK "
          f"({len(df)} rows)")


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "check-be":
        check_scala_be(sys.argv[2])
        return
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/sas"
    import os
    os.makedirs(out_dir, exist_ok=True)
    u64 = build(u64=True, split_pages=True)
    x86 = build(u64=False, split_pages=False)
    rle = build_compressed(b"SASYZCRL", rle_compress)
    rdc = build_compressed(b"SASYZCR2", rdc_compress)
    df = validate(u64, "fixture_u64 (meta+data pages)", COLS, ROWS)
    validate(x86, "fixture_x86 (single mix page)", COLS, ROWS)
    df_rle = validate(rle, "fixture_rle (SASYZCRL subheader rows)",
                      RLE_COLS, RLE_ROWS)
    df_rdc = validate(rdc, "fixture_rdc (SASYZCR2 subheader rows)",
                      RLE_COLS, RLE_ROWS)
    with open(f"{out_dir}/fixture_u64.sas7bdat", "wb") as f:
        f.write(u64)
    with open(f"{out_dir}/fixture_x86.sas7bdat", "wb") as f:
        f.write(x86)
    with open(f"{out_dir}/fixture_rle.sas7bdat", "wb") as f:
        f.write(rle)
    with open(f"{out_dir}/fixture_rdc.sas7bdat", "wb") as f:
        f.write(rdc)
    df.to_csv(f"{out_dir}/golden.csv", index=False)
    df_rle.to_csv(f"{out_dir}/golden_rle.csv", index=False)
    df_rdc.to_csv(f"{out_dir}/golden_rdc.csv", index=False)
    print(f"wrote fixtures to {out_dir}")


if __name__ == "__main__":
    main()
