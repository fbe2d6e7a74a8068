"""Worker process for tests/test_multiprocess.py: one JAX process of a
2-process CPU cluster (4 virtual devices each, Gloo collectives).

Exercises the REAL multi-host code path end to end — the path single-
process CPU-mesh tests can't reach (reference capability: Lightning DDP,
``litfass/train.py:285-292``):
  distributed_init -> TTSDataset.shard_across_hosts -> per-host loader
  -> global-batch pjit train step (fit) -> orbax save/restore across
  processes.

Invoked as: python tests/mp_worker.py <pid> <port> <corpus> <ckpt_dir>
Prints machine-checkable lines the parent test asserts on.
"""

import sys
from pathlib import Path


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]
    corpus, ckpt_dir = Path(sys.argv[3]), Path(sys.argv[4])

    import jax

    jax.config.update("jax_num_cpu_devices", 4)

    from lightningfastspeech2_tpu.parallel import mesh as mesh_lib

    mesh_lib.distributed_init(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    import numpy as np

    from lightningfastspeech2_tpu.core import config as C
    from lightningfastspeech2_tpu.core.checkpoint import Checkpointer
    from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset

    dcfg = DataConfig(
        variances=("pitch", "energy"),
        variance_levels=("phone", "frame"),
        variance_transforms=("none", "none"),
        stat_entries=4, augment_duration=0.0,
        max_phones=32, max_frames=256, seed=3,
    )
    ds = TTSDataset(root=corpus, cfg=dcfg)
    n_total = len(ds)
    ds.shard_across_hosts()
    ids = sorted(e.utt_id for e in ds.entries)
    print(f"SHARD pid={pid} total={n_total} local={len(ds)} "
          f"ids={','.join(ids)}", flush=True)

    mesh = mesh_lib.make_mesh(C.MeshConfig(data=8, model=1))

    cfg = C.Config(
        model=C.ModelConfig(
            encoder=C.StackConfig(hidden=32, heads=2, layers=1,
                                  kernel_sizes=(3,), conv_filter_size=64),
            decoder=C.StackConfig(hidden=32, heads=2, layers=1,
                                  kernel_sizes=(3,), conv_filter_size=64),
            variance=C.VarianceConfig(
                variances=("pitch", "energy"),
                levels=("phone", "frame"),
                transforms=("none", "none"),
                losses=("mse", "mse"),
                nlayers=(1, 1), kernel_sizes=(3, 3), dropouts=(0.1, 0.1),
                loss_weights=(0.1, 0.1), filter_size=32, nbins=16,
            ),
            duration=C.DurationConfig(nlayers=1, filter_size=32),
            speaker_type="dvector",
            max_phones=32, max_frames=256,
        ),
        train=C.TrainConfig(batch_size=8, max_steps=2, num_workers=0,
                            log_every=1, seed=0, bf16=False),
    )

    from lightningfastspeech2_tpu.train.loop import fit

    losses = []
    result = fit(
        cfg, ds, max_steps=2, mesh=mesh,
        log_fn=lambda s, m: losses.append(m.get("total")),
    )
    for i, l in enumerate(losses):
        print(f"LOSS pid={pid} step={i} total={l:.6f}", flush=True)

    # ---- orbax save/restore across processes --------------------------
    ckptr = Checkpointer(ckpt_dir)
    ckptr.save(2, result.state, cfg=cfg, sidecar={"phone2id": ds.vocab.phone2id})
    tree, cfg2, sidecar = ckptr.restore(template={
        "params": result.state.params,
        "opt_state": result.state.opt_state,
        "step": result.state.step,
    })
    ok = True
    for a, b in zip(
        jax.tree_util.tree_leaves(tree["params"]),
        jax.tree_util.tree_leaves(result.state.params),
    ):
        if not np.allclose(np.asarray(a), np.asarray(b)):
            ok = False
    assert cfg2 is not None and sidecar["phone2id"] == ds.vocab.phone2id
    print(f"RESTORE pid={pid} ok={ok}", flush=True)


if __name__ == "__main__":
    main()
