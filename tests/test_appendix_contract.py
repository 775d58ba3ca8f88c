"""Byte-level contract test for appendix().

The appendix string is the reference's experiment-naming contract: it names
every checkpoint file and the MM-WHS evaluator parses values back OUT of it.
Expected strings below are hand-derived from the reference sources
(``src/train_mscmrseg.py:644-662``, ``src/train_mmwhs.py:740-805``) by
following each encoder line by line — they are NOT computed with the code
under test.

Intentional deltas (PARITY.md deviation 7): ``.pred1d2`` is never emitted
(flag dropped as obsolete).
"""

import pytest

from pointcloududa_tpu.config import appendix, mmwhs_default, mscmrseg_default

A = "train_point_tpu"

MSCMRSEG_CASES = [
    # (overrides, expected)
    (dict(), f"{A}.lr0.001"),
    (dict(lr_fix=2e-4), f"{A}.lr0.0002"),
    (dict(apdx="exp7"), "exp7.lr0.001"),
    (dict(d1=True), f"{A}.lr0.001.d1lr2.5e-05"),
    (
        dict(d1=True, d2=True, d4=True),
        f"{A}.lr0.001.d1lr2.5e-05.d2lr2.5e-05.d4lr2.5e-05",
    ),
    (dict(d4=True, d4lr=1e-4), f"{A}.lr0.001.d4lr0.0001"),
    # -aug is store_false: the TAG appears when augmentation is OFF
    (dict(aug=""), f"{A}.lr0.001.aug"),
    (dict(aug="aug2"), f"{A}.lr0.001.aug2"),
    (dict(offdecay=False), f"{A}.lr0.001.offdecay"),
    (dict(decay_e=70), f"{A}.lr0.001.decay_e70"),
    (dict(wp=1.5), f"{A}.lr0.001.wp1.5"),
    # composition order: d-lrs, aug, offdecay, decay_e, wp
    (
        dict(d2=True, aug="aug2", offdecay=False, decay_e=30, wp=0.5),
        f"{A}.lr0.001.d2lr2.5e-05.aug2.offdecay.decay_e30.wp0.5",
    ),
    # momentum/w*/etc are NOT encoded on the MS-CMRSeg side
    (dict(w1=0.5, mmt=0.5, dmmt=0.8, sgd=True, softmax=True), f"{A}.lr0.001"),
]

MMWHS_CASES = [
    # mmwhs_default(): aug='' and mh=False -> '.mh' (tag when matching OFF)
    (dict(), f"{A}.lr0.001.mh"),
    (dict(mh=True), f"{A}.lr0.001"),
    (dict(filters=16), f"{A}.lr0.001.nf16.mh"),
    (dict(mmt=0.9), f"{A}.lr0.001.mmt0.9.mh"),
    # dmmt != default suppresses the per-disc momentum tags
    (dict(dmmt=0.8, d1mmt=0.7), f"{A}.lr0.001.dmmt0.8.mh"),
    (dict(d1mmt=0.7), f"{A}.lr0.001.d1mmt0.7.mh"),
    (dict(d2mmt=0.9, d4mmt=0.85), f"{A}.lr0.001.d2mmt0.9.d4mmt0.85.mh"),
    (dict(aug="heavy"), f"{A}.lr0.001.mh.hvyaug"),
    (dict(aug="light"), f"{A}.lr0.001.mh.litaug"),
    # w*/sgd precede the mh tag (train_mmwhs.py:762-771)
    (dict(w4=1.5), f"{A}.lr0.001.w4_1.5.mh"),
    (dict(sgd=True), f"{A}.lr0.001.sgd.mh"),
    (dict(softmax=True), f"{A}.lr0.001.mh.softmax"),
    (dict(etpls=True, Tetpls=True), f"{A}.lr0.001.mh.etpls.Tetpls"),
    (dict(dr=1.0), f"{A}.lr0.001.mh.dr1.0"),
    (dict(d4aux=True, ft=True), f"{A}.lr0.001.mh.ft.d4aux"),
    (
        # the full kitchen sink pins the global tag ORDER
        dict(
            d1=True, d2=True, d4=True, w1=0.5, w2=2.0, sgd=True, mh=True,
            aug="heavy", softmax=True, offdecay=False, wp=0.7, etpls=True,
            Tetpls=True, heinit=True, cvinit=True, extd1=True, extpn=True,
            ft=True, d4aux=True, dr=1.0,
        ),
        f"{A}.lr0.001.d1lr2.5e-05.d2lr2.5e-05.d4lr2.5e-05.w1_0.5.w2_2.0.sgd"
        ".hvyaug.softmax.offdecay.wp0.7.etpls.Tetpls.he.cv.extd1.extpn.ft"
        ".d4aux.dr1.0",
    ),
    (dict(extd2=True, extd4=True), f"{A}.lr0.001.mh.extd2.extd4"),
    (dict(filters=48, lr_fix=2e-4), f"{A}.lr0.0002.nf48.mh"),
]


@pytest.mark.parametrize("overrides,expected", MSCMRSEG_CASES)
def test_appendix_mscmrseg(overrides, expected):
    assert appendix(mscmrseg_default(**overrides)) == expected


@pytest.mark.parametrize("overrides,expected", MMWHS_CASES)
def test_appendix_mmwhs(overrides, expected):
    assert appendix(mmwhs_default(**overrides)) == expected
