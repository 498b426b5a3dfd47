"""Worker for the multi-process (simulated multi-host) test.

Run as: python tests/_dist_worker.py <process_id> <coordinator_port>

Two processes x 4 virtual CPU devices = an 8-device global ('sat','time')
mesh spanning a process (DCN) boundary: the sharded acquisition sweep and its
all-reduce argmax must produce the same detection as the single-process path
(SURVEY.md §4: multi-host without a cluster via jax.distributed).
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from gypsum_tpu.core.planes import to_planes  # noqa: E402
from gypsum_tpu.ops.correlate import replica_fft_conj_table  # noqa: E402
from gypsum_tpu.parallel.sharded import sharded_acquisition_sweep  # noqa: E402
from gypsum_tpu.signal.prn import replica_table  # noqa: E402
from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq  # noqa: E402

FS, L = 2.046e6, 2046

assert len(jax.local_devices()) == 4
assert len(jax.devices()) == 8

mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("sat", "time"))

# Identical host data in both processes (deterministic synthesis).
truth = SyntheticSatellite(prn=17, doppler_hz=1500.0, delay_samples=321, amplitude=0.3)
iq = synthesize_iq([truth], 4 * L, FS, noise_sigma=0.3, seed=4).reshape(4, L)
samples_np = to_planes(iq)  # [4, L, 2]
pfc_np = to_planes(replica_fft_conj_table(replica_table(L)))  # [32, L, 2]
dop_np = np.arange(-2000.0, 2001.0, 500.0, dtype=np.float32)


def global_array(host_np, spec):
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        host_np.shape, sharding, lambda idx: host_np[idx]
    )


samples = global_array(samples_np, P())
dopplers = global_array(dop_np, P())
pfc = global_array(pfc_np, P("sat", None, None))

strength, d_idx, code_phase, best_row, best_val = sharded_acquisition_sweep(
    mesh, samples, dopplers, pfc, FS
)
# best_row / best_val are replicated (out_specs P()) -> addressable anywhere.
row = int(np.asarray(jax.device_get(best_row)))
val = float(np.asarray(jax.device_get(best_val)))
assert row == 16, f"proc {pid}: strongest row {row}, want 16 (PRN 17)"
assert val > 3.0, f"proc {pid}: strength {val}"
print(f"proc {pid}: OK best_row={row} strength={val:.1f}", flush=True)
