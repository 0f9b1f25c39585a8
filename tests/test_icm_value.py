"""Verdict logic of the ICM winning-regime study (bench/icm_value.py):
the paired equal-wall aggregation must pair reps correctly, censor
non-hitting runs honestly, and name winners by hit-then-hitting-time."""

import numpy as np

from montecarlosolvers_tpu.bench import icm_value


def _segs(walls, bests):
    return {"segments": [
        dict(wall_s=w, sweeps=(i + 1) * 500, e_best=b, e_cold=b,
             swap_rate=0.5, h_frac=0.25)
        for i, (w, b) in enumerate(zip(walls, bests))
    ]}


class TestSummarize:
    def test_pairing_and_winners(self):
        L, seed, h = icm_value.L_SIZES[0], 0, icm_value.CADENCES_BY_L[
            icm_value.L_SIZES[0]][0]
        done = {
            # rep 0: icm hits at wall 1.0; pt hits later at 2.0 -> icm
            f"icm_h{h}_L{L}_s{seed}": _segs([0.5, 1.0], [-9.0, -10.0]),
            f"pt_L{L}_s{seed}": _segs([1.0, 2.0], [-9.0, -10.0]),
            # rep 1: icm never hits e_ref; pt does -> pt
            f"icm_h{h}_L{L}_s{seed}_r1": _segs([0.5, 1.0], [-9.0, -9.0]),
            f"pt_L{L}_s{seed}_r1": _segs([1.0, 2.0], [-9.0, -10.0]),
        }
        out = icm_value.summarize(done)
        v = out[f"L{L}_h{h}"]
        assert v["pairs"] == 2
        assert v["icm_wins"] == 1 and v["pt_wins"] == 1 and v["ties"] == 0
        assert v["icm_hit_frac"] == 0.5 and v["pt_hit_frac"] == 1.0
        assert v["icm_median_ttr"] == 1.0
        assert v["pt_median_ttr"] == 2.0

    def test_e_ref_spans_all_cadences(self):
        """The instance reference is the best energy ANY arm found —
        an arm must not get credit for 'hitting' its own weaker best."""
        L = icm_value.L_SIZES[0]
        hs = icm_value.CADENCES_BY_L[L]
        done = {
            f"icm_h{hs[0]}_L{L}_s0": _segs([1.0], [-8.0]),
            f"icm_h{hs[1]}_L{L}_s0": _segs([1.0], [-12.0]),  # sets e_ref
            f"pt_L{L}_s0": _segs([1.0], [-8.0]),
        }
        out = icm_value.summarize(done)
        v0 = out[f"L{L}_h{hs[0]}"]
        # neither the weak icm arm nor pt reached -12: censored both ways
        assert v0["icm_hit_frac"] == 0.0 and v0["pt_hit_frac"] == 0.0
        # eps tie-break: equal eps -> tie
        assert v0["ties"] == 1

    def test_no_pairs_no_entry(self):
        out = icm_value.summarize({})
        assert out == {}