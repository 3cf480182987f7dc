#!/usr/bin/env python3
"""Handcraft SPSS .sav golden fixtures for SavSpec.

The system-file layout followed here is the one publicly documented in
the PSPP manual ("System File Format" appendix). Unlike sas7bdat there
is NO independent .sav implementation in this sandbox (no pyreadstat /
savReaderWriter / R), so these fixtures are assembled field-by-field
from the spec text by a SECOND implementation kept deliberately
separate from the Scala reader/writer — conformance is anchored to the
spec, and the Scala round-trip is additionally pinned against these
exact bytes.

Emits (under src/test/resources/sav/):
  fixture_plain.sav      uncompressed, string continuations, labels,
                         documents, info records, one sysmis
  fixture_bytecode.sav   compression=1 bytecode stream exercising all
                         five command classes (pad/biased/raw/spaces/
                         sysmis)
  fixture_zlib.zsav      compression=2 ($FL3): the SAME bytecode stream
                         wrapped in the PSPP-documented zheader/
                         ztrailer zlib block table, split across TWO
                         blocks so the multi-block walk is exercised
  golden.csv             the intended decoded frame
"""
import os
import struct
import sys
import zlib

SYSMIS = struct.unpack("<d", struct.pack("<d", -1.7976931348623157e308))[0]

# the intended frame: id numeric, name string(10) with row 12 blank
# (all spaces -> null), score numeric with row 5 sysmis
ROWS = [
    (float(i),
     "" if i == 12 else f"w{i % 4}_{i}",
     None if i == 5 else i * 0.75 - 2.0)
    for i in range(20)
]


def pad(b: bytes, n: int, fill=b" ") -> bytes:
    assert len(b) <= n, (b, n)
    return b + fill * (n - len(b))


def var_record(typ: int, name: bytes, label: bytes | None = None) -> bytes:
    out = struct.pack("<iiiiii", 2, typ, 1 if label else 0, 0,
                      0x050800 if typ == 0 else 0x010A00,  # F8.2 / A10-ish
                      0x050800 if typ == 0 else 0x010A00)
    out += pad(name, 8)
    if label is not None:
        out += struct.pack("<i", len(label))
        out += pad(label, (len(label) + 3) // 4 * 4, b"\x00")
    return out


def dictionary() -> bytes:
    d = b""
    # ID numeric, NAME string(10) = 2 elements, SCORE numeric
    d += var_record(0, b"ID", b"case id")
    d += var_record(10, b"NAME")
    d += var_record(-1, b"")            # continuation of NAME
    d += var_record(0, b"SCORE")

    # value labels (type 3) + the variables they attach to (type 4):
    # label value 0.0 as "zero" on ID (element index 1, 1-based)
    lab = b"zero"
    d += struct.pack("<ii", 3, 1)
    d += struct.pack("<d", 0.0)
    body = bytes([len(lab)]) + lab
    d += pad(body, (len(body) + 7) // 8 * 8, b" ")
    d += struct.pack("<iii", 4, 1, 1)

    # document record (type 6): two 80-char lines
    d += struct.pack("<ii", 6, 2)
    d += pad(b"graft sav fixture", 80)
    d += pad(b"second doc line", 80)

    # info record 7.3: machine integer info (8 i32: version etc)
    d += struct.pack("<iiii", 7, 3, 4, 8)
    d += struct.pack("<8i", 1, 0, 0, 0, 1, 2, 3, 65001)
    # info record 7.4: machine float info (sysmis, highest, lowest)
    d += struct.pack("<iiii", 7, 4, 8, 3)
    d += struct.pack("<3d", SYSMIS, 1.7976931348623157e308,
                     -1.7976931348623157e308)
    # info record 7.13: long variable names (SHORT=long, \t-separated)
    ln = b"ID=id\tNAME=name\tSCORE=score"
    d += struct.pack("<iiii", 7, 13, 1, len(ln)) + ln
    # dictionary terminator
    d += struct.pack("<ii", 999, 0)
    return d


def header(compression: int, case_size: int = 4, n_rows: int = None) -> bytes:
    h = b"$FL3" if compression == 2 else b"$FL2"
    h += pad(b"@(#) SPSS DATA FILE graft fixture", 60)
    h += struct.pack("<iiii", 2, case_size, compression, 0)  # layout, size,
    h += struct.pack("<i", len(ROWS) if n_rows is None else n_rows)
    h += struct.pack("<d", 100.0)                    # bias
    h += pad(b"15 Aug 26", 9)
    h += pad(b"12:00:00", 8)
    h += pad(b"graft fixture", 64)
    h += b"\x00" * 3
    assert len(h) == 176, len(h)
    return h


def case_elements(row):
    rid, name, score = row
    els = [struct.pack("<d", rid)]
    nb = pad(name.encode("ascii"), 16)  # width 10 -> 2 elements
    els += [nb[0:8], nb[8:16]]
    els += [struct.pack("<d", SYSMIS if score is None else score)]
    return els


def plain_data() -> bytes:
    return b"".join(b"".join(case_elements(r)) for r in ROWS)


def bytecode_data() -> bytes:
    """Exercise every command class: 253 raw, biased small ints,
    254 all-spaces strings, 255 sysmis, 0 padding at the tail."""
    cmds = []
    raws = []
    for r in ROWS:
        rid, name, score = r
        # id: small non-negative integers -> biased command when exact
        if rid == int(rid) and -100 < rid < 151:
            cmds.append(int(rid) + 100)
        else:
            cmds.append(253)
            raws.append(struct.pack("<d", rid))
        nb = pad(name.encode("ascii"), 16)
        for chunk in (nb[0:8], nb[8:16]):
            if chunk == b" " * 8:
                cmds.append(254)
            else:
                cmds.append(253)
                raws.append(chunk)
        if score is None:
            cmds.append(255)
        else:
            cmds.append(253)
            raws.append(struct.pack("<d", score))
    cmds.append(252)  # end of file
    out = b""
    i = 0
    ri = 0
    while i < len(cmds):
        block = cmds[i:i + 8]
        n_raw = sum(1 for c in block if c == 253)
        out += bytes(block) + b"\x00" * (8 - len(block))
        out += b"".join(raws[ri:ri + n_raw])
        ri += n_raw
        i += 8
    assert ri == len(raws)
    return out


def zlib_data(dict_len: int) -> bytes:
    """Wrap the bytecode stream in the zheader/blocks/ztrailer layout
    (PSPP manual, "ZLIB Compressed Data Record"). Two blocks on purpose:
    the split lands mid-stream, so a reader that mishandles block
    boundaries decodes garbage rows."""
    stream = bytecode_data()
    zheader_ofs = 176 + dict_len
    split = (len(stream) // 2) & ~7  # 8-aligned, mid-stream
    spans = [(0, split), (split, len(stream) - split)]
    blocks = [zlib.compress(stream[s:s + n]) for s, n in spans]
    ztrailer_len = 24 + 24 * len(blocks)
    out = struct.pack("<qqq", zheader_ofs,
                      zheader_ofs + 24 + sum(len(b) for b in blocks),
                      ztrailer_len)
    out += b"".join(blocks)
    out += struct.pack("<qqii", -100, 0, 0x3FF000, len(blocks))
    at = zheader_ofs + 24
    for (s, n), b in zip(spans, blocks):
        out += struct.pack("<qqii", zheader_ofs + s, at, n, len(b))
        at += len(b)
    return out


# --- very long strings (info subtype 14): one id + one 600-wide text.
# 600 bytes span 3 segments (255/255/96 declared; 252/252/96 real data)
VLS_W = 600
VLS_ROWS = [
    (float(i),
     "" if i == 4 else
     f"doc{i}:" + "".join(chr(97 + (i * 7 + j) % 26)
                          for j in range((i * 83) % (VLS_W - 8))))
    for i in range(12)
]


def _segment(name: bytes, w: int) -> bytes:
    out = var_record(w, name)
    for _ in range((w + 7) // 8 - 1):
        out += var_record(-1, b"")
    return out


def vls_file() -> bytes:
    d = var_record(0, b"ID")
    d += _segment(b"LONGTXT", 255)
    d += _segment(b"LONGTX0", 255)
    d += _segment(b"LONGTX1", VLS_W - 504)
    ln = b"ID=id\tLONGTXT=txt"
    d += struct.pack("<iiii", 7, 13, 1, len(ln)) + ln
    vl = b"LONGTXT=00600\x00\t"
    d += struct.pack("<iiii", 7, 14, 1, len(vl)) + vl
    d += struct.pack("<ii", 999, 0)
    case_size = 1 + 32 + 32 + (VLS_W - 504 + 7) // 8
    data = b""
    for rid, txt in VLS_ROWS:
        els = struct.pack("<d", rid)
        b = txt.encode("ascii")
        for real, area in ((252, 256), (252, 256),
                           (VLS_W - 504, (VLS_W - 504 + 7) // 8 * 8)):
            seg = b[:real]
            b = b[real:]
            els += seg + b" " * (area - len(seg))
        assert len(els) == case_size * 8
        data += els
    return header(0, case_size, len(VLS_ROWS)) + d + data


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/sav"
    os.makedirs(out_dir, exist_ok=True)
    with open(f"{out_dir}/fixture_plain.sav", "wb") as f:
        f.write(header(0) + dictionary() + plain_data())
    with open(f"{out_dir}/fixture_bytecode.sav", "wb") as f:
        f.write(header(1) + dictionary() + bytecode_data())
    with open(f"{out_dir}/fixture_zlib.zsav", "wb") as f:
        f.write(header(2) + dictionary() + zlib_data(len(dictionary())))
    with open(f"{out_dir}/fixture_vls.sav", "wb") as f:
        f.write(vls_file())
    with open(f"{out_dir}/golden.csv", "w") as f:
        f.write("id,name,score\n")
        for rid, name, score in ROWS:
            f.write("%s,%s,%s\n" % (
                rid, name, "" if score is None else score))
    print(f"wrote fixtures to {out_dir}")


if __name__ == "__main__":
    main()
