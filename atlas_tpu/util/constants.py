"""Physical and numeric constants (reference: atlas util/Constants.h, util/Earth.h)."""

import math

EARTH_RADIUS = 6371229.0  # [m] atlas util::Earth::radius() (IFS value)
DEG2RAD = math.pi / 180.0
RAD2DEG = 180.0 / math.pi
MICRODEG = 1_000_000  # microdegree scaling used for unique point ids (util/Unique.h)
