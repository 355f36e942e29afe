"""Trajectory evaluation: ATE / RPE, vendored.

The reference ships no evaluation code — its README points users at the
external TUM benchmark scripts (evaluate_ate.py / associate.py) and the
KITTI devkit (SURVEY.md section 4). Here the evaluation pipeline is part
of the framework.
"""

from orb_slam2_test_tpu.evaluation.ate import (  # noqa: F401
    absolute_trajectory_error,
    associate_trajectories,
    relative_pose_error,
    umeyama_alignment,
)
