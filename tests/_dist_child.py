"""Child process for the 2-process jax.distributed smoke test.

Exercises the reference's world_size/rank contract (ddp_setup + NCCL
process groups + DistributedSampler, driver :45-54, Load_datasets.py:25)
the TPU-native way: jax.distributed.initialize over a coordinator, strided
record sharding per process, a global mesh spanning both processes, and an
in-graph cross-process confusion-histogram reduction (XLA collective over
the distributed CPU backend — ICI/DCN on real hardware).

Usage: python tests/_dist_child.py <process_id> <num_processes> <port> <out>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port, out = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert jax.process_index() == pid

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pnp_ovss_tpu.data.datasets import shard_records
    from pnp_ovss_tpu.evalx.metrics import fast_hist, fast_hist_jnp
    from pnp_ovss_tpu.parallel import mesh as mesh_mod

    # Record sharding follows the reference's DistributedSampler stride.
    records = list(range(11))
    mine = shard_records(records, pid, nproc)
    assert mine == records[pid::nproc], (mine, pid)

    # Global data: every process derives the full set deterministically,
    # then contributes only its own shard to the sharded array.
    n_class, hw = 5, 16
    rng = np.random.RandomState(7)
    gt_all = rng.randint(0, n_class, (2 * nproc, hw, hw)).astype(np.int32)
    pred_all = rng.randint(0, n_class, (2 * nproc, hw, hw)).astype(np.int32)

    mesh = mesh_mod.make_mesh()  # spans ALL processes' devices
    assert mesh.devices.size == nproc * jax.local_device_count()
    sharding = mesh_mod.batch_sharding(mesh)

    def put(global_np):
        per_dev = global_np.shape[0] // mesh.devices.size
        arrs = []
        for d in jax.local_devices():
            # Device order in the mesh == jax.devices() order.
            idx = list(mesh.devices.ravel()).index(d)
            arrs.append(
                jax.device_put(
                    global_np[idx * per_dev : (idx + 1) * per_dev], d
                )
            )
        return jax.make_array_from_single_device_arrays(
            global_np.shape, sharding, arrs
        )

    gt_g, pred_g = put(gt_all), put(pred_all)

    @jax.jit
    def total_hist(gt, pred):
        hists = jax.vmap(lambda t, p: fast_hist_jnp(t, p, n_class))(gt, pred)
        return hists.sum(axis=0)  # cross-process collective under the mesh

    with mesh:
        tot = total_hist(gt_g, pred_g)
    tot = np.asarray(
        jax.device_put(tot, NamedSharding(mesh, P()))
    )

    want = sum(
        fast_hist(t.flatten(), p.flatten(), n_class)
        for t, p in zip(gt_all, pred_all)
    )
    np.testing.assert_array_equal(tot, want)
    np.save(os.path.join(out, f"total_rank{pid}.npy"), tot)

    # Cross-rank metric sync (reference SmoothedValue.all_reduce,
    # utils.py:48-59): rank r contributes r+1 samples of value 10*(r+1);
    # after sync every rank must report the identical global average.
    from pnp_ovss_tpu.utils.logging import MetricLogger

    logger = MetricLogger()
    for _ in range(pid + 1):
        logger.update(imgs_per_s=10.0 * (pid + 1))
    logger.synchronize_between_processes()
    m = logger.meters["imgs_per_s"]
    want_count = sum(r + 1 for r in range(nproc))
    want_total = sum((r + 1) * 10.0 * (r + 1) for r in range(nproc))
    assert m.count == want_count, (m.count, want_count)
    assert abs(m.global_avg - want_total / want_count) < 1e-9
    print(f"dist child {pid}/{nproc} global_avg={m.global_avg:.6f}",
          flush=True)
    print(f"dist child {pid}/{nproc} OK", flush=True)


if __name__ == "__main__":
    main()
