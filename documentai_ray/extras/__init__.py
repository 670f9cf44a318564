"""OFF-MISSION extras quarantine (VERDICT r3 #8).

The analytics/math trivia kernels (vampire numbers, D'Hondt seats,
Bulgarian solitaire, ...) carried from round 2 live here, OUT of the
capability engine's source tree: nothing under ``documentai_ray/stages``
(or any core module) imports this package eagerly — the lazy name
resolver in ``stages/aggregates.py`` pulls it in only when a trivia
query actually calls one of these kernels. ``import documentai_ray``
and the whole flagship/capability surface load without touching it.

Every kernel here remains real, oracle-mirrored code (the driver
registry keeps its entries, per the r3 instruction to preserve the
query dict); the quarantine is about source-tree clarity: the engine is
``stages/ functions/ sources/ state/ pipelines/``, and this directory
is not part of it.
"""
