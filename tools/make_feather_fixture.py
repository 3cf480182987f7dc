#!/usr/bin/env python3
"""Write Feather v2 (Arrow IPC file) golden fixtures for FeatherSpec
with pyarrow — the REAL producer and an independent public
implementation of the publicly specified Arrow columnar format.

Emits (under src/test/resources/feather/):
  fixture_unc.feather    uncompressed, 2 record batches, every
                         supported column kind incl. nulls
  fixture_lz4.feather    the SAME frame, LZ4_FRAME buffer compression
                         (the pyarrow default)
  golden.csv             what pyarrow itself reads back

The second half validates the SCALA writer: if a path is passed as
argv[2], that file (written by Feather.dumps) is read back with
pyarrow and checked against the closed form used by FeatherSpec.
"""
import os
import sys
from datetime import date as _date

import pyarrow as pa
import pyarrow.feather as feather


def frame() -> pa.Table:
    n = 40
    return pa.table({
        "i8": pa.array([None if i % 11 == 3 else (i % 120) - 60
                        for i in range(n)], type=pa.int8()),
        "i16": pa.array([None if i % 13 == 5 else i * 77 - 900
                         for i in range(n)], type=pa.int16()),
        "i32": pa.array([None if i % 7 == 2 else i * 10007 - 90000
                         for i in range(n)], type=pa.int32()),
        "i64": pa.array([None if i % 9 == 4 else i * 1000003 - 9999999
                         for i in range(n)], type=pa.int64()),
        "f32": pa.array([None if i % 8 == 1 else i * 0.25 - 2.0
                         for i in range(n)], type=pa.float32()),
        "f64": pa.array([None if i % 6 == 0 else i * 0.125 - 1.0
                         for i in range(n)], type=pa.float64()),
        "b": pa.array([None if i % 10 == 7 else (i % 3 == 0)
                       for i in range(n)], type=pa.bool_()),
        "s": pa.array(["" if i % 12 == 6 else
                       None if i % 12 == 2 else f"s{i}_" + "x" * (i % 9)
                       for i in range(n)], type=pa.utf8()),
        "d": pa.array([None if i % 14 == 9 else 20000 + i * 13
                       for i in range(n)], type=pa.date32()),
        "ts": pa.array([None if i % 15 == 8
                        else 1700000000_000000 + i * 987_654_321
                        for i in range(n)], type=pa.timestamp("us")),
        "u32": pa.array([None if i % 16 == 11 else 4000000000 + i
                         for i in range(n)], type=pa.uint32()),
        "lu": pa.array([None if i % 17 == 4 else f"L{i}_" + "y" * (i % 7)
                        for i in range(n)], type=pa.large_utf8()),
        # date64 stores epoch MILLIS; build from date objects so the
        # scaling is pyarrow's own (ints would be taken verbatim as ms)
        "d64": pa.array([None if i % 18 == 13
                         else _date.fromordinal(719163 + 19000 + i * 11)
                         for i in range(n)], type=pa.date64()),
        # a pandas-categorical column: pyarrow writes a DictionaryBatch
        # block and an index column
        "cat": pa.array([None if i % 19 == 6 else f"cat_{i % 5}"
                         for i in range(n)]).dictionary_encode(),
    })


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/feather"
    os.makedirs(out_dir, exist_ok=True)
    t = frame()
    # two batches on purpose: the per-block walk (and the paged
    # reader's block parallelism) must cross a batch boundary
    batches = t.to_batches(max_chunksize=24)
    assert len(batches) == 2, len(batches)
    t2 = pa.Table.from_batches(batches)
    for name, comp in (("fixture_unc.feather", "uncompressed"),
                       ("fixture_lz4.feather", "lz4")):
        p = f"{out_dir}/{name}"
        feather.write_feather(t2, p, compression=comp, chunksize=24)
        back = feather.read_table(p)
        assert back.equals(t2.combine_chunks()) or back.combine_chunks() \
            .equals(t2.combine_chunks()), name
        print(f"{name}: pyarrow round-trip OK "
              f"({len(back)} rows, {back.num_columns} cols)")
    df = feather.read_table(f"{out_dir}/fixture_unc.feather").to_pandas()
    df.to_csv(f"{out_dir}/golden.csv", index=False)
    # the SAME frame zstd-compressed: decoded via zstd-jni since r17
    # (previously a refusal fixture)
    feather.write_feather(t2, f"{out_dir}/fixture_zstd.feather",
                          compression="zstd")
    # refusal fixture: an int64 past 2^53 must stop loudly, never
    # decode silently wrong
    feather.write_feather(
        pa.table({"k": pa.array([1, 2 ** 60], type=pa.int64())}),
        f"{out_dir}/fixture_bigint.feather", compression="uncompressed")
    # binary columns (media blobs): read through readFeatherTyped — the
    # tall-cell pivot refuses them loudly
    feather.write_feather(
        pa.table({"media_id": pa.array(range(6), type=pa.int64()),
                  "blob": pa.array([None if i == 3 else
                                    bytes((i * 37 + j) % 256
                                          for j in range(i * 11 + 1))
                                    for i in range(6)], type=pa.binary())}),
        f"{out_dir}/fixture_bin.feather", compression="uncompressed")
    # embedding-vector columns: the two standard Arrow layouts
    # (fixed_size_list<float32> — what pyarrow writes for vector
    # tables — and list<float32/float64>), read through
    # readFeatherTyped as ArrayType. Deterministic closed form
    # asserted by FeatherSpec:
    #   emb_fsl[i][j] = i + j*0.25      (8 wide; row null iff i%7==3)
    #   emb_list[i][j] = i - j*0.5      (len i%5; row null iff i%9==4;
    #                                    element j==1 null iff i%6==0)
    #   emb_d[i][j] = i*0.125 + j       (len 3 f64; row null iff i%8==5)
    nv = 30
    vec_t = pa.table({
        "doc_id": pa.array(range(nv), type=pa.int64()),
        "emb_fsl": pa.array(
            [None if i % 7 == 3 else [i + j * 0.25 for j in range(8)]
             for i in range(nv)],
            type=pa.list_(pa.float32(), 8)),
        "emb_list": pa.array(
            [None if i % 9 == 4 else
             [None if (j == 1 and i % 6 == 0) else i - j * 0.5
              for j in range(i % 5)]
             for i in range(nv)],
            type=pa.list_(pa.float32())),
        "emb_d": pa.array(
            [None if i % 8 == 5 else [i * 0.125 + j for j in range(3)]
             for i in range(nv)],
            type=pa.list_(pa.float64())),
    })
    vb = vec_t.to_batches(max_chunksize=16)
    assert len(vb) == 2, len(vb)
    vec_t2 = pa.Table.from_batches(vb)
    for name, comp in (("fixture_vec.feather", "uncompressed"),
                       ("fixture_vec_lz4.feather", "lz4"),
                       ("fixture_vec_zstd.feather", "zstd")):
        feather.write_feather(vec_t2, f"{out_dir}/{name}",
                              compression=comp, chunksize=16)
        back = feather.read_table(f"{out_dir}/{name}")
        assert back.combine_chunks().equals(vec_t2.combine_chunks()), name
        print(f"{name}: pyarrow round-trip OK")
    print(f"wrote fixtures to {out_dir}")


def check_scala_writer(path: str):
    """pyarrow reads a Feather.dumps file: 300 rows of the closed form
    FeatherSpec uses (k double, txt string with nulls)."""
    t = feather.read_table(path)
    assert t.column_names == ["k", "grp", "score", "note"], t.column_names
    n = len(t)
    assert n == 300, n
    k = t.column("k").to_pylist()
    grp = t.column("grp").to_pylist()
    score = t.column("score").to_pylist()
    note = t.column("note").to_pylist()
    for i in range(n):
        assert k[i] == float(i)
        assert grp[i] == f"g{i % 3}"
        if i % 4 == 0:
            assert score[i] is None, (i, score[i])
        else:
            assert score[i] == i * 0.5 - 3.0
        if i % 5 == 0:
            assert note[i] is None, (i, note[i])
        else:
            assert note[i] == f"n{i}"
    print(f"{path}: pyarrow reads the SCALA-written feather OK ({n} rows)")


def check_scala_vec(path: str):
    """pyarrow reads a Feather.dumpsTyped vector file: 50 rows of the
    closed form FeatherSpec's writer test uses — vid double,
    fsl fixed_size_list<float32, 6>, lst list<float32>."""
    t = feather.read_table(path)
    assert t.column_names == ["vid", "fsl", "lst"], t.column_names
    assert pa.types.is_fixed_size_list(t.schema.field("fsl").type), \
        t.schema.field("fsl").type
    assert t.schema.field("fsl").type.list_size == 6
    assert pa.types.is_list(t.schema.field("lst").type), \
        t.schema.field("lst").type
    assert t.schema.field("lst").type.value_type == pa.float32()
    n = len(t)
    assert n == 50, n
    vid = t.column("vid").to_pylist()
    fsl = t.column("fsl").to_pylist()
    lst = t.column("lst").to_pylist()
    f32 = lambda x: pa.scalar(x, type=pa.float32()).as_py()
    for i in range(n):
        assert vid[i] == float(i)
        if i % 7 == 3:
            assert fsl[i] is None, (i, fsl[i])
        else:
            assert fsl[i] == [f32(i + j * 0.25) for j in range(6)], i
        if i % 9 == 4:
            assert lst[i] is None, (i, lst[i])
        else:
            want = [None if (j == 1 and i % 6 == 0) else f32(i - j * 0.5)
                    for j in range(i % 5)]
            assert lst[i] == want, (i, lst[i], want)
    print(f"{path}: pyarrow reads the SCALA-written vector feather OK "
          f"({n} rows)")


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[3] == "vec":
        check_scala_vec(sys.argv[2])
    elif len(sys.argv) > 2:
        check_scala_writer(sys.argv[2])
    else:
        main()
