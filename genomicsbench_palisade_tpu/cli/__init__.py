"""CLI drivers reproducing the reference benchmark binaries' flags and
printed outputs (L4/L5 of SURVEY.md §1)."""
