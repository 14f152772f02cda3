"""Contracts of the benchmark row generators (bench.py) that the round
artifacts depend on — importable without touching the TPU backend."""

import importlib.util
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "wcb_bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # module level = constants only, no jax
    return mod


class TestRealisticRows:
    def test_deterministic_and_shared_between_metrics(self, bench):
        """decode_rtf_realistic and decode_rtf_bucketed must decode the SAME
        rows (ADVICE r3): the generator is pure in its rng seed."""
        a = bench._realistic_rows(224)
        b = bench._realistic_rows(224)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_row_contract(self, bench):
        durations, audio, forced = bench._realistic_rows(224)
        n = bench.BATCH
        assert durations.shape == (n,) and audio.shape == (n, 30 * 16000)
        assert forced.shape == (n,) and forced.dtype == np.int32
        assert (durations >= 5.0).all() and (durations <= 30.0).all()
        assert (forced >= 1).all() and (forced <= 223).all()
        # audio is real speech up to the duration, zero padding after
        for i in (0, n - 1):
            edge = int(durations[i] * 16000)
            assert np.any(audio[i, :edge] != 0.0)
            assert not np.any(audio[i, edge:])

    def test_lengths_track_corpus_distribution(self, bench):
        """Sampled decode lengths follow the embedded corpus deciles scaled
        by duration: a full-30 s row's length stays inside the corpus range
        and the mean sits near mean(deciles) * mean(duration)/30."""
        dec = bench.CORPUS_TOKEN_DECILES
        assert dec == sorted(dec)
        durations, _, forced = bench._realistic_rows(224)
        scale = durations / 30.0
        unscaled = forced / scale + 1.0  # undo the duration scaling (+eot)
        assert unscaled.min() >= dec[0] - 1
        assert unscaled.max() <= dec[-1] + 1
        assert abs(float(np.mean(unscaled)) - 78.3) < 8.0  # measured mean

    def test_small_max_new_clips(self, bench):
        _, _, forced = bench._realistic_rows(16)
        assert (forced <= 15).all() and (forced >= 1).all()
