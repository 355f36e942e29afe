"""L3 kernels: image pyramid, FAST, BRIEF, descriptor matching."""
