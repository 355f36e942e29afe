"""L2 map data model: struct-of-arrays MapState, covisibility, KF database."""

from orb_slam2_test_tpu.slam_map.mapstate import (
    MapState,
    MapCapacity,
    make_empty_map,
)
from orb_slam2_test_tpu.slam_map.covisibility import (
    covisibility_weights,
    best_covisible,
    observation_counts,
)
