"""Parallelism: meshes, halo exchange, ensembles."""
