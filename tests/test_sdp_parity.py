"""SDP component parity vs the ACTUAL reference modules: the dilated
depthwise-separable conv stack and the spline ConvFlow (deterministic
forward + reverse) with converted weights."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not __import__("pathlib").Path("/root/reference").exists(),
    reason="reference tree not mounted",
)



@pytest.fixture(scope="module")
def ref_sdp():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import litfass.third_party.stochastic_duration_predictor.sdp as sdp

    return sdp


def test_dds_conv_parity(ref_sdp):
    import jax
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.models.sdp import DilatedDepthSeparableConv
    from lightningfastspeech2_tpu.utils.torch_convert import _dds_conv

    torch.manual_seed(0)
    C, k, L = 16, 3, 2
    ref = ref_sdp.DilatedDepthSeparableConv(C, k, L, 0.0).eval()
    state = {f"d.{n}": p.detach().numpy() for n, p in ref.state_dict().items()}
    params = _dds_conv(state, "d", L)

    g = np.random.default_rng(0)
    B, T = 2, 11
    x = g.standard_normal((B, T, C)).astype(np.float32)
    pad = np.zeros((B, T), bool)
    pad[1, 8:] = True
    gcond = g.standard_normal((B, T, C)).astype(np.float32)

    # reference: (B, C, T) with mask (B, 1, T) where 1 = valid
    with torch.no_grad():
        want = ref(
            torch.from_numpy(x).transpose(1, 2),
            torch.from_numpy((~pad)[:, None, :].astype(np.float32)),
            g=torch.from_numpy(gcond).transpose(1, 2),
        ).transpose(1, 2).numpy()
    got = DilatedDepthSeparableConv(C, k, L, 0.0).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x), jnp.asarray(~pad), jnp.asarray(gcond), True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_conv_flow_parity(ref_sdp):
    import jax
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.models.sdp import ConvFlow
    from lightningfastspeech2_tpu.utils.torch_convert import convert_conv_flow

    torch.manual_seed(1)
    hidden, k, L = 16, 3, 2
    ref = ref_sdp.ConvFlow(2, hidden, k, L).eval()
    # zero-init proj (reference does this) would make the flow identity;
    # randomize so the spline actually transforms
    with torch.no_grad():
        ref.proj.weight.normal_(0, 0.3)
        ref.proj.bias.normal_(0, 0.1)
    state = {f"f.{n}": p.detach().numpy() for n, p in ref.state_dict().items()}
    params = convert_conv_flow(state, "f", L)

    g = np.random.default_rng(1)
    B, T = 2, 9
    x = g.standard_normal((B, T, 2)).astype(np.float32)
    pad = np.zeros((B, T), bool)
    pad[0, 7:] = True

    with torch.no_grad():
        want_y, want_ld = ref(
            torch.from_numpy(x).transpose(1, 2),
            torch.from_numpy((~pad)[:, None, :].astype(np.float32)),
        )
        want_y = want_y.transpose(1, 2).numpy()
    flow = ConvFlow(2, hidden, k, L)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    got_y, got_ld = flow.apply(variables, jnp.asarray(x), jnp.asarray(~pad))
    np.testing.assert_allclose(np.asarray(got_y), want_y, atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_ld), want_ld.numpy(), atol=3e-4)

    # reverse direction too
    with torch.no_grad():
        want_x = ref(
            torch.from_numpy(want_y).transpose(1, 2),
            torch.from_numpy((~pad)[:, None, :].astype(np.float32)),
            reverse=True,
        ).transpose(1, 2).numpy()
    got_x = flow.apply(variables, jnp.asarray(want_y), jnp.asarray(~pad),
                       reverse=True)
    np.testing.assert_allclose(np.asarray(got_x), want_x, atol=3e-5)
