"""I/O surface: LAMMPS-compatible data files, thermo/log output, dump
trajectories, and orbax checkpoints (SURVEY.md §2.8, §3.3, §3.4)."""
