"""Device-mesh construction for the receiver's parallel axes.

The workload's inherent parallel structure (SURVEY.md §2.4) maps to named
mesh axes:

- ``sat``  — satellites / tracking channels / PRN search rows. The
             data-parallel-like axis: embarrassingly parallel, no collectives
             except the final peak reduce.
- ``time`` — signal-time blocks for streaming correlation sweeps. The
             sequence-parallel-like axis: neighbors exchange overlap-save
             halos via ppermute (a correlation window spans block edges).

There is no reference analogue (the reference is single-process numpy,
SURVEY.md §5 "Distributed communication backend: none"); this design follows
the BASELINE.json north star: satellites x Doppler x time-blocks partitioned
over chips, peak search via all-reduce argmax, halos via collective permute.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def factor_devices(n: int) -> tuple[int, int]:
    """Split n devices into (sat, time) axis sizes: prefer the largest
    time axis <= sat axis so both parallel styles are exercised."""
    best = (n, 1)
    for t in range(1, int(np.sqrt(n)) + 1):
        if n % t == 0:
            best = (n // t, t)
    return best


def make_receiver_mesh(
    devices: list | None = None, sat: int | None = None, time: int | None = None
) -> Mesh:
    """A 2-D ('sat', 'time') mesh over the given (default: all) devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    n = devs.size
    if sat is None or time is None:
        sat, time = factor_devices(n)
    if sat * time != n:
        raise ValueError(f"mesh {sat}x{time} != {n} devices")
    return Mesh(devs.reshape(sat, time), axis_names=("sat", "time"))
