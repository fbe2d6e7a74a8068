"""cli.train_vocoder end-to-end: train a tiny HiFi-GAN a few steps on a
synthetic wav corpus, checkpoint, resume, and serve the saved generator."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture()
def wav_corpus(tmp_path):
    from lightningfastspeech2_tpu.data import wav as wav_io

    root = tmp_path / "wavs"
    root.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        t = np.arange(8000) / 22050.0
        sig = 0.4 * np.sin(2 * np.pi * (150 + 40 * i) * t)
        sig += 0.01 * rng.standard_normal(len(t))
        wav_io.write(root / f"utt{i}.wav", sig.astype(np.float32), 22050)
    return root


TINY = [
    "--upsample_rates", "8", "2",
    "--upsample_kernel_sizes", "16", "4",
    "--upsample_initial_channel", "16",
    "--resblock_kernel_sizes", "3",
    "--segment_size", "1024",
    "--batch_size", "2",
]


def test_train_vocoder_cli_and_resume(wav_corpus, tmp_path):
    from lightningfastspeech2_tpu.cli.train_vocoder import main

    ckpt = tmp_path / "voc_ckpts"
    logs = tmp_path / "logs"
    main([
        "--train_target_path", str(wav_corpus),
        "--checkpoint_dir", str(ckpt),
        "--log_dir", str(logs),
        "--max_steps", "3",
        "--checkpoint_every", "2",
        "--log_every", "1",
        *TINY,
    ])
    assert (ckpt / "latest").exists()
    lines = [json.loads(l) for l in
             (logs / "metrics.jsonl").read_text().splitlines()]
    assert any("train/d_loss" in l for l in lines)
    assert any("train/mel" in l for l in lines)

    # resume continues from the saved step counter
    main([
        "--train_target_path", str(wav_corpus),
        "--checkpoint_dir", str(ckpt),
        "--from_checkpoint", str(ckpt),
        "--log_dir", str(logs),
        "--max_steps", "5",
        "--checkpoint_every", "100",
        "--log_every", "1",
        *TINY,
    ])
    lines = [json.loads(l) for l in
             (logs / "metrics.jsonl").read_text().splitlines()
             if l.strip()]
    # fresh run logged steps 0..2, resumed run 3..4
    steps = [l["step"] for l in lines]
    assert 4 in steps and steps.count(0) == 1

    # the saved generator serves: rebuild the architecture from the
    # checkpoint sidecar alone (what generate --hifigan_checkpoint does)
    from lightningfastspeech2_tpu.core.checkpoint import Checkpointer
    from lightningfastspeech2_tpu.vocoder import hifigan as hg

    tree, _, sidecar = Checkpointer(ckpt).restore()
    gc = sidecar["hifigan_config"]
    gen_cfg = hg.HifiGanConfig(
        upsample_rates=tuple(gc["upsample_rates"]),
        upsample_kernel_sizes=tuple(gc["upsample_kernel_sizes"]),
        upsample_initial_channel=gc["upsample_initial_channel"],
        resblock_kernel_sizes=tuple(gc["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in gc["resblock_dilation_sizes"]
        ),
    )
    assert gen_cfg.upsample_rates == (8, 2)
    assert gen_cfg.upsample_initial_channel == 16
    gen = hg.Generator(gen_cfg)
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 32, 80)), jnp.float32
    )
    wav = gen.apply(
        jax.tree_util.tree_map(jnp.asarray, tree["params"]["gen"]), mel
    )
    assert wav.shape == (1, 32 * gen_cfg.hop_length)
    assert bool(jnp.all(jnp.isfinite(wav)))


def test_from_torch_hifigan_warm_start(wav_corpus, tmp_path):
    """--from_torch_hifigan folds a weight-normed torch generator into the
    trainer; with lr=0 the checkpointed generator equals the conversion."""
    import torch

    from lightningfastspeech2_tpu.cli.train_vocoder import main
    from lightningfastspeech2_tpu.core.checkpoint import Checkpointer
    from lightningfastspeech2_tpu.vocoder import hifigan as hg

    gen_cfg = hg.HifiGanConfig(
        upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),),
    )
    rng = np.random.default_rng(0)

    def wn(shape):
        v = rng.standard_normal(shape).astype(np.float32)
        g = np.abs(rng.standard_normal((shape[0], 1, 1))).astype(np.float32)
        return g, v

    state = {}

    def add(prefix, out_c, in_c, k):
        g, v = wn((out_c, in_c, k))
        state[f"{prefix}.weight_g"] = torch.tensor(g)
        state[f"{prefix}.weight_v"] = torch.tensor(v)
        state[f"{prefix}.bias"] = torch.tensor(
            rng.standard_normal(out_c).astype(np.float32))

    add("conv_pre", 16, 80, 7)
    add("conv_post", 1, 4, 7)
    # ConvTranspose1d weight layout is (in, out, k); weight_norm still
    # normalizes over dim 0, and the bias length is the OUT channels
    g, v = wn((16, 8, 16))
    state["ups.0.weight_g"], state["ups.0.weight_v"] = (
        torch.tensor(g), torch.tensor(v))
    state["ups.0.bias"] = torch.tensor(
        rng.standard_normal(8).astype(np.float32))
    g, v = wn((8, 4, 4))
    state["ups.1.weight_g"], state["ups.1.weight_v"] = (
        torch.tensor(g), torch.tensor(v))
    state["ups.1.bias"] = torch.tensor(
        rng.standard_normal(4).astype(np.float32))
    for rb, ch in ((0, 8), (1, 4)):
        for j in range(3):
            add(f"resblocks.{rb}.convs1.{j}", ch, ch, 3)
            add(f"resblocks.{rb}.convs2.{j}", ch, ch, 3)
    pt = tmp_path / "gen.pth"
    torch.save(state, pt)

    ckpt = tmp_path / "warm_ckpts"
    main([
        "--train_target_path", str(wav_corpus),
        "--checkpoint_dir", str(ckpt),
        "--from_torch_hifigan", str(pt),
        "--max_steps", "1", "--log_every", "1", "--lr", "0",
        *TINY,
    ])
    tree, _, _ = Checkpointer(ckpt).restore()
    expected = hg.convert_torch_state_dict(
        {k: v.numpy() for k, v in state.items()}, gen_cfg)
    got = tree["params"]["gen"]["params"]
    want = expected["params"]
    np.testing.assert_allclose(
        np.asarray(got["conv_pre"]["kernel"]),
        np.asarray(want["conv_pre"]["kernel"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got["ups_1"]["kernel"]),
        np.asarray(want["ups_1"]["kernel"]), atol=1e-6)
