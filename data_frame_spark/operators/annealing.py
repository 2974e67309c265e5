"""Generic simulated annealing (reference annealing.rkt:105-167).

A driver-side probabilistic optimizer whose goal function may be a
distributed aggregate (that is how the fit refinements use it —
least-squares-fit.rkt:128-146): the search loop is O(iterations)
tiny driver steps; each goal evaluation can fan out to the cluster.
"""

from __future__ import annotations

import math
import random
from typing import Callable, TypeVar

S = TypeVar("S")


def annealing(
    initial: S,
    goal: Callable[[S], float],
    neighbour: Callable[[S, float], S],
    iterations: int = 1000,
    temperature: Callable[[float], float] | None = None,
    transition: Callable[[float, float, float], float] | None = None,
    restart_after: int | None = None,
    rng: random.Random | None = None,
) -> S:
    """Minimize ``goal`` from ``initial``. ``neighbour(state, temp)``
    proposes a move; ``temperature(progress)`` maps progress in
    [0,1) to a temperature (default 1-progress); ``transition(cost,
    new_cost, temp)`` gives the acceptance probability for a worse
    move (default exp(-(Δ)/temp)); ``restart_after`` restarts from
    the best state after that many non-improving steps
    (annealing.rkt:143-156)."""
    rng = rng or random.Random()
    temperature = temperature or (lambda p: 1.0 - p)
    transition = transition or (
        lambda cost, new_cost, temp: math.exp(-(new_cost - cost) / max(temp, 1e-12))
    )
    state, cost = initial, goal(initial)
    best, best_cost = state, cost
    stale = 0
    for i in range(iterations):
        temp = temperature(i / iterations)
        cand = neighbour(state, temp)
        cand_cost = goal(cand)
        if cand_cost < cost or rng.random() < transition(cost, cand_cost, temp):
            state, cost = cand, cand_cost
        if cost < best_cost:
            best, best_cost = state, cost
            stale = 0
        else:
            stale += 1
            if restart_after is not None and stale >= restart_after:
                state, cost = best, best_cost
                stale = 0
    return best
