"""Write-side reference serialization (construct/sdslwrite.py): build ->
write <prefix>.rbwt/.tsa/.mab -> re-read through the sdslio readers ->
identical tables.  Also re-emits the decoded committed reference fixture and
re-reads it, proving the writers handle real reference-shaped data."""

import os

import numpy as np
import pytest

from rowbowt_tpu.construct import sdslio, sdslwrite

REF_DATA = os.path.join(
    os.environ.get("RBT_REFERENCE_ROOT", "/root/reference"), "tests", "data")


def test_roundtrip_panel_index(tiny_index, tmp_path):
    idx = tiny_index
    pre = str(tmp_path / "out")
    paths = sdslwrite.save_reference_format(idx, pre)
    assert pre + ".rbwt" in paths and pre + ".tsa" in paths \
        and pre + ".mab" in paths

    bwt = sdslio.load_rbwt(pre + ".rbwt")
    run_len = np.diff(np.append(idx.run_start, idx.n))
    exp_bwt = np.repeat(idx.alpha.decode(idx.run_head.astype(np.int64)),
                        run_len)
    np.testing.assert_array_equal(bwt, exp_bwt)

    ssa, esa = sdslio.load_tsa(pre + ".tsa", expect_n=idx.n)
    exp_ssa = np.empty(idx.R, dtype=np.int64)
    exp_ssa[idx.pred_to_run] = idx.pred_pos
    np.testing.assert_array_equal(ssa, exp_ssa)
    np.testing.assert_array_equal(esa, np.asarray(idx.samples_last))

    ma_row, ma_val, w = sdslio.load_mab(pre + ".mab")
    assert w == idx.ma_wsize
    np.testing.assert_array_equal(ma_row, np.asarray(idx.ma_row))
    np.testing.assert_array_equal(ma_val, np.asarray(idx.ma_val))


def test_roundtrip_loads_as_index(tiny_index, tmp_path):
    """The emitted files feed load_serialized_index — the same entry the
    committed reference binaries use — and reproduce the index."""
    idx = tiny_index
    pre = str(tmp_path / "out")
    sdslwrite.save_reference_format(idx, pre)
    back = sdslio.load_serialized_index(pre)
    assert (back.n, back.R) == (idx.n, idx.R)
    np.testing.assert_array_equal(back.run_start, idx.run_start)
    np.testing.assert_array_equal(back.run_head, idx.run_head)
    np.testing.assert_array_equal(np.asarray(back.samples_last),
                                  np.asarray(idx.samples_last))
    np.testing.assert_array_equal(np.asarray(back.ma_row),
                                  np.asarray(idx.ma_row))
    np.testing.assert_array_equal(back.ma_val, idx.ma_val)
    assert back.doc_names == idx.doc_names


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="no reference data")
def test_rewrite_reference_fixture(tmp_path):
    """Decode the committed reference .rbwt/.tsa/.mab, re-emit them with our
    writers, re-read: identical content (reference-shaped data, including
    the 256-letter vectors and multi-node Huffman shapes)."""
    src = os.path.join(REF_DATA, "small.fa")
    bwt = sdslio.load_rbwt(src + ".rbwt")
    ssa, esa = sdslio.load_tsa(src + ".tsa", expect_n=bwt.shape[0])
    ma_row, ma_val, w = sdslio.load_mab(src + ".mab")

    pre = str(tmp_path / "re")
    sdslwrite.write_rbwt(pre + ".rbwt", bwt)
    sdslwrite.write_tsa(pre + ".tsa", ssa, esa, bwt.shape[0])
    n = int(bwt.shape[0])
    sdslwrite.write_mab(pre + ".mab", ma_row, ma_val, w, n)

    np.testing.assert_array_equal(sdslio.load_rbwt(pre + ".rbwt"), bwt)
    s2, e2 = sdslio.load_tsa(pre + ".tsa", expect_n=n)
    np.testing.assert_array_equal(s2, ssa)
    np.testing.assert_array_equal(e2, esa)
    r2, v2, w2 = sdslio.load_mab(pre + ".mab")
    assert w2 == w
    np.testing.assert_array_equal(r2, ma_row)
    np.testing.assert_array_equal(v2, ma_val)
