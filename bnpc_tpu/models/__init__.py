"""MCMC move kernels (Gibbs, parameter MH, alpha, error rates, split-merge)."""
