"""Host-side navigation solution: orbits, clocks, pseudoranges, position fix."""

from gypsum_tpu.solve.ephemeris import Ephemeris, ephemeris_from_subframes  # noqa: F401
from gypsum_tpu.solve.world import WorldModel, ReceiverSolution  # noqa: F401
