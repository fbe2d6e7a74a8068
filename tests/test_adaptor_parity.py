"""Full VarianceAdaptor parity vs the actual reference module: the whole
pre-decoder pipeline (duration prediction, phone/frame variance encoders,
length regulation) with converted weights."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not __import__("pathlib").Path("/root/reference").exists(),
    reason="reference tree not mounted",
)



@pytest.fixture(scope="module")
def ref_model():
    import scipy.signal

    from lightningfastspeech2_tpu.audio.cwt import ricker as _ricker

    if not hasattr(scipy.signal, "cwt"):
        scipy.signal.cwt = lambda d, w, ws: None
        scipy.signal.ricker = _ricker
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import litfass.fastspeech2.model as rm

    return rm


def build_pair(ref_model, T_static=64):
    import jax

    from lightningfastspeech2_tpu.core import config as C
    from lightningfastspeech2_tpu.models.variance_adaptor import (
        VarianceAdaptor, VarianceStats,
    )
    from lightningfastspeech2_tpu.utils import torch_convert as tc

    torch.manual_seed(3)
    H = 32
    stats = {
        "pitch": {"min": -2.0, "max": 2.0, "mean": 0.0, "std": 1.0},
        "energy": {"min": -2.0, "max": 2.0, "mean": 0.0, "std": 1.0},
    }
    ref_va = ref_model.VarianceAdaptor(
        stats, ["pitch", "energy"], ["phone", "frame"], ["none", "none"],
        [2, 2], [3, 3], [0.0, 0.0], H, 16, True,
        2, False, 3, 0.0, H, True, H, T_static,
    ).eval()
    state = {f"va.{n}": p.detach().numpy()
             for n, p in ref_va.state_dict().items()}
    params = {
        "duration_predictor": tc._variance_predictor(
            state, "va.duration_predictor", 2, True
        )
    }
    for var in ("pitch", "energy"):
        p = f"va.encoders.{var}"
        params[f"encoder_{var}"] = {
            "predictor": tc._variance_predictor(state, f"{p}.predictor", 2, True),
            "embedding": {"embedding": state[f"{p}.embedding.weight"]},
        }
    vcfg = C.VarianceConfig(
        variances=("pitch", "energy"), levels=("phone", "frame"),
        transforms=("none", "none"), losses=("mse", "mse"), nlayers=(2, 2),
        kernel_sizes=(3, 3), dropouts=(0.0, 0.0), loss_weights=(1, 1),
        filter_size=H, nbins=16, depthwise=True,
    )
    dcfg = C.DurationConfig(nlayers=2, kernel_size=3, dropout=0.0,
                            filter_size=H, depthwise=True)
    ours = VarianceAdaptor(
        vcfg, dcfg, H, T_static,
        tuple((k, VarianceStats(**v)) for k, v in stats.items()), 16,
    )
    import jax.numpy as jnp

    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    return ref_va, ours, variables, H


def test_training_forward_parity_single_item(ref_model):
    """B=1 (the checkpoint-parity synthesis scenario): everything matches
    to float tolerance including the frame-level variance tower."""
    import jax.numpy as jnp

    ref_va, ours, variables, H = build_pair(ref_model)
    g = np.random.default_rng(7)
    P = 8
    x = g.standard_normal((1, P, H)).astype(np.float32)
    pad = np.zeros((1, P), bool)
    durations = g.integers(1, 6, (1, P))
    T_ref = int(durations.sum())
    pitch_t = g.standard_normal((1, P)).astype(np.float32)
    energy = g.standard_normal((1, 64)).astype(np.float32)

    with torch.no_grad():
        want = ref_va(
            torch.from_numpy(x), torch.from_numpy(pad),
            {
                "duration": torch.from_numpy(durations),
                "variances_pitch": torch.from_numpy(pitch_t),
                "variances_energy": torch.from_numpy(energy[:, :T_ref]),
            },
            inference=False,
        )
    got = ours.apply(
        variables, jnp.asarray(x), jnp.asarray(~pad),
        {
            "duration": jnp.asarray(durations.astype(np.int32)),
            "variances_pitch": jnp.asarray(pitch_t),
            "variances_energy": jnp.asarray(energy),
        },
        inference=False, tf=True,
    )
    np.testing.assert_allclose(
        np.asarray(got["x"])[:, :T_ref], want["x"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["duration_prediction"]),
        want["duration_prediction"].numpy(), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got["variances_pitch"]), want["variances_pitch"].numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got["variances_energy"])[:, :T_ref],
        want["variances_energy"].numpy(), atol=1e-5,
    )


def test_training_forward_parity_batch(ref_model):
    """B=2 ragged batch: full parity — the batch-extent masking in
    VariancePredictor reproduces the reference's batch-max tensor bound
    exactly, including its pad rows for shorter items."""
    import jax.numpy as jnp

    ref_va, ours, variables, H = build_pair(ref_model)
    g = np.random.default_rng(8)
    B, P = 2, 8
    x = g.standard_normal((B, P, H)).astype(np.float32)
    pad = np.zeros((B, P), bool)
    pad[1, 6:] = True
    durations = g.integers(1, 6, (B, P)) * (~pad)
    T_ref = int(durations.sum(1).max())
    pitch_t = g.standard_normal((B, P)).astype(np.float32)
    energy = g.standard_normal((B, 64)).astype(np.float32)

    with torch.no_grad():
        want = ref_va(
            torch.from_numpy(x), torch.from_numpy(pad),
            {
                "duration": torch.from_numpy(durations),
                "variances_pitch": torch.from_numpy(pitch_t),
                "variances_energy": torch.from_numpy(energy[:, :T_ref]),
            },
            inference=False,
        )
    got = ours.apply(
        variables, jnp.asarray(x), jnp.asarray(~pad),
        {
            "duration": jnp.asarray(durations.astype(np.int32)),
            "variances_pitch": jnp.asarray(pitch_t),
            "variances_energy": jnp.asarray(energy),
        },
        inference=False, tf=True,
    )
    np.testing.assert_allclose(
        np.asarray(got["x"])[:, :T_ref], want["x"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["duration_prediction"]),
        want["duration_prediction"].numpy(), atol=1e-5,
    )
    e_got = np.asarray(got["variances_energy"])[:, :T_ref]
    e_want = want["variances_energy"].numpy()
    np.testing.assert_allclose(e_got, e_want, atol=1e-5)


def test_inference_durations_parity(ref_model):
    """Inference path: predicted duration rounding + rescue semantics."""
    import jax.numpy as jnp

    ref_va, ours, variables, H = build_pair(ref_model)
    g = np.random.default_rng(9)
    P = 8
    x = g.standard_normal((1, P, H)).astype(np.float32)
    pad = np.zeros((1, P), bool)

    with torch.no_grad():
        want = ref_va(torch.from_numpy(x), torch.from_numpy(pad), {},
                      inference=True)
    got = ours.apply(variables, jnp.asarray(x), jnp.asarray(~pad), None,
                     inference=True)
    np.testing.assert_array_equal(
        np.asarray(got["duration_rounded"]),
        want["duration_rounded"].numpy(),
    )
