from zpaqfranz_tpu.models import tables


def test_self_test():
    tables.self_test()


def test_squash_stretch_inverse():
    # stretch is the approximate inverse of squash (away from saturation)
    for x in (-500, -100, -1, 0, 1, 100, 500):
        p = tables.squash(x)
        assert 0 <= p <= 32767
        assert abs(tables.stretch(p) - x) <= 3
    assert tables.squash(-2048) == 0 and tables.squash(2047) == 32767


def test_state_table_counts():
    # every state's counts are consistent with its successors
    for s in range(256):
        n0, n1 = int(tables.SNS[s * 4 + 2]), int(tables.SNS[s * 4 + 3])
        assert 0 <= n0 <= 48 and 0 <= n1 <= 48
    assert tables.st_next(0, 0) == 1
    assert tables.st_next(0, 1) == 2


def test_dt_formula():
    assert int(tables.DT[0]) == (1 << 17) // 3 * 2
    assert int(tables.DT2K[1]) == 2048
