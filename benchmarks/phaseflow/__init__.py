# BenchPhaseFlow literature-problem suite (Johansen-Colella,
# Schwartz-Colella, Liu-Fedkiw, connectivity) — see harness.py.
