"""L3 optimization: GN/LM pose opt, BA (dense-Schur + Schur-CG), RANSAC solvers."""
