"""SDE with Stratonovich interpretation and multiplicative noise.

Mirrors `/root/reference/examples/advanced_pdes/stratonovich.py`: a custom
`make_noise_variance` makes the noise amplitude state-dependent, and the
interpretation adds the corresponding drift correction.
"""

import numpy as np

import pde_tpu as pde


class AllenCahnNoisePDE(pde.PDE):
    """Allen-Cahn PDE with multiplicative (state-dependent) noise."""

    use_noise_variance = True

    def make_noise_variance(self, state, *, ret_diff=False):
        noise = 1.0

        if ret_diff:

            def noise_variance(leaves, t):
                return (
                    [noise * y**2 for y in leaves],
                    [2 * noise * y for y in leaves],
                )

        else:

            def noise_variance(leaves, t):
                return [noise * y**2 for y in leaves]

        return noise_variance


eq = AllenCahnNoisePDE(
    rhs={"c": "laplace(c) + c - c**3"},
    noise=1.0,
    noise_interpretation="stratonovich",
    rng=np.random.default_rng(42),
)
state = pde.ScalarField.random_uniform(pde.UnitGrid([32, 32]), -1, 1)
result = eq.solve(state, t_range=0.5, dt=1e-3, solver="milstein", tracker=None)
result.plot(title="Stratonovich Allen-Cahn")
