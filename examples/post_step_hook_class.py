"""Post-step hook in a custom class, with hook-driven simulation abort.

Mirrors `/root/reference/examples/advanced_pdes/post_step_hook_class.py`: the
hook limits the state to ≤1 and accumulates the total correction. The
reference aborts by raising ``StopIteration`` inside the hook; here the hook
runs INSIDE the compiled device loop where exceptions cannot propagate, so the
TPU-idiomatic abort is a cheap host-side tracker that inspects the accumulated
hook data between windows and raises ``StopIteration`` there.
"""

import jax.numpy as jnp

import pde_tpu as pde


class CustomPDE(pde.PDEBase):
    def make_post_step_hook(self, state):
        """Hook limiting the state to ≤ 1, accumulating the total correction."""

        def post_step_hook(leaves, t, post_step_data):
            (y,) = leaves
            clipped = jnp.minimum(y, 1.0)
            overshoot = jnp.sum(y - clipped)
            return [clipped], post_step_data + overshoot

        return post_step_hook, 0.0  # hook function and initial value for data

    def evolution_rate(self, state, t=0):
        return pde.ScalarField(state.grid, 1.0)  # constant growth


grid = pde.UnitGrid([64, 64])
state = pde.ScalarField.random_uniform(grid, 0.0, 0.5)

eq = CustomPDE()
solver = pde.solvers.EulerSolver(eq, adaptive=False)


def abort_when_corrected(state, t):
    """Stop cleanly once the accumulated correction exceeds the threshold."""
    if float(solver.info.get("post_step_data", 0.0)) > 400:
        raise StopIteration


controller = pde.solvers.Controller(
    solver,
    t_range=1e4,
    tracker=[pde.CallbackTracker(abort_when_corrected, interrupts=10.0)],
)
result = controller.run(state, dt=0.1)
total = float(solver.info["post_step_data"])
result.plot(title=f"Total correction={total:.1f}")
