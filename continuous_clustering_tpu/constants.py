"""Shared label constants.

The reference encodes ground-point labels as entries of a 147-color debug enum
(``clustering/continuous_clustering.hpp:15-22`` aliases GP_* onto colors).  We
separate the two concerns: compact semantic labels (used on device) and debug
labels (used only for visualization / oracle-exact backtracking rules).
"""

# Semantic ground point labels (device-side uint8)
GP_UNKNOWN = 0
GP_GROUND = 1
GP_OBSTACLE = 2
GP_EGO_VEHICLE = 3
GP_FOG = 4

# Debug labels. The values are arbitrary but distinct; the *identities* matter
# because the reference's obstacle-backtracking and last-ground-point rules
# branch on them (src/clustering/continuous_clustering.cpp:519,542,548).
DBG_WHITE = 0        # unknown
DBG_GRAY = 1         # first ring as ground
DBG_GREEN = 2        # certain ground (flat wrt prev, no obstacle yet)
DBG_YELLOWGREEN = 3  # ground (flat wrt prev + last ground, after obstacle)
DBG_YELLOW = 4       # ground because close to last certain ground
DBG_ORANGE = 5       # first point is obstacle
DBG_RED = 6          # obstacle
DBG_DARKRED = 7      # retroactively relabeled obstacle
DBG_VIOLET = 8       # ego vehicle
DBG_LIGHTGRAY = 9    # fog
DBG_BURLYWOOD = 10   # terrain ground (stubbed, like the reference)

# Sentinel for "no cluster"
NO_CLUSTER = 0
