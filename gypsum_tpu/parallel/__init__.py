"""Multi-chip sharding: device meshes, sharded acquisition, streaming halos."""

from gypsum_tpu.parallel.mesh import make_receiver_mesh  # noqa: F401
