"""Physical and protocol constants for GPS L1 C/A.

All values come from IS-GPS-200 (the public GPS interface spec).
Reference parity: gypsum/constants.py:7-38.
"""

# --- C/A code structure (IS-GPS-200 §3.3.2.3) ---------------------------------
# Chips per C/A PRN sequence (one full Gold code).
PRN_CHIP_COUNT: int = 1023
# The full 1023-chip PRN repeats 1000x per second (1.023 Mchip/s chipping rate).
PRN_REPETITIONS_PER_SECOND: int = 1000
CA_CHIP_RATE_HZ: float = float(PRN_CHIP_COUNT * PRN_REPETITIONS_PER_SECOND)  # 1.023e6

# --- Carrier -------------------------------------------------------------------
GPS_L1_FREQUENCY_HZ: float = 1575.42e6

# --- Navigation message (IS-GPS-200 §20.3) ------------------------------------
BITS_PER_SECOND: int = 50
PSEUDOSYMBOLS_PER_NAVIGATION_BIT: int = 20  # 20 x 1ms PRN correlations per bit
PSEUDOSYMBOLS_PER_SECOND: int = PSEUDOSYMBOLS_PER_NAVIGATION_BIT * BITS_PER_SECOND
BITS_PER_SUBFRAME: int = 300
SECONDS_PER_SUBFRAME: int = BITS_PER_SUBFRAME // BITS_PER_SECOND  # 6
WORDS_PER_SUBFRAME: int = 10
DATA_BITS_PER_WORD: int = 24
PARITY_BITS_PER_WORD: int = 6
BITS_PER_WORD: int = DATA_BITS_PER_WORD + PARITY_BITS_PER_WORD
# The 8-bit TLM preamble that starts every subframe (IS-GPS-200 Figure 20-2).
TELEMETRY_PREAMBLE_BITS: tuple[int, ...] = (1, 0, 0, 0, 1, 0, 1, 1)

# --- Geometry / solver ---------------------------------------------------------
MINIMUM_SATELLITES_FOR_POSITION_FIX: int = 4
# WGS84 speed of light in vacuum, per IS-GPS-200 §30.3.4.3.
SPEED_OF_LIGHT_M_PER_S: float = 2.99792458e8
# WGS84 earth gravitational parameter (mu), IS-GPS-200 Table 20-IV.
EARTH_GRAVITATIONAL_PARAM: float = 3.986005e14
# WGS84 earth rotation rate (rad/s), IS-GPS-200 Table 20-IV.
EARTH_ROTATION_RATE_RAD_PER_S: float = 7.2921151467e-5
# Relativistic clock correction constant F = -2*sqrt(mu)/c^2 (s/sqrt(m)).
RELATIVISTIC_CLOCK_CORRECTION_F: float = -4.442807633e-10
# The ICD's own value of pi, used for semicircle->radian conversions
# (IS-GPS-200 §20.3.3.4.3: "the sensitivity of the results to pi").
GPS_PI: float = 3.1415926535898

# --- Time frames ---------------------------------------------------------------
# Unix epoch 1970/01/01; GPS epoch 1980/01/06 -> offset is 10 years + 7 days.
UNIX_TIMESTAMP_OF_GPS_EPOCH: float = (60 * 60 * 24) * ((365 * 10) + 7)
SECONDS_PER_WEEK: int = 60 * 60 * 24 * 7
SECONDS_PER_HALF_WEEK: int = SECONDS_PER_WEEK // 2

ONE_MILLISECOND: float = 0.001
