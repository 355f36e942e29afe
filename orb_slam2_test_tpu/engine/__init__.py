"""L4/L5 SLAM engine: Frame, Tracking, LocalMapping, LoopClosing, System."""
