"""Every example main() EXECUTES end-to-end at tiny iteration counts
(VERDICT r1 #8: an example must not be able to rot while its import stays
green). Tiny configs keep each run to a few seconds on the CPU mesh; the
full-size runs remain the manual / verify drives."""
import importlib.util
import pathlib

import pytest

EXAMPLES_DIR = pathlib.Path(__file__).parent.parent / "examples"
EXAMPLES = sorted(EXAMPLES_DIR.glob("*.py"))

# argv for a fast-but-real run of each example's main()
TINY_ARGV = {
    "gaussian_process": ["--iters", "400"],
    "expert_gpr": ["--init-iters", "150", "--rounds", "2", "--iters", "100",
                   "--n", "60"],
    "linear_models": ["--map-iters", "300", "--vi-iters", "500"],
    "amortized_svi": ["--n", "4096", "--iters", "200", "--minibatch", "256"],
    "hmc_bnn": ["--chains", "8", "--samples", "50", "--warmup", "50"],
    "smc_tomography": ["--grid", "4", "--particles", "512"],
    "gp_classification": ["--n-exact", "40", "--n-svgp", "2048",
                          "--iters", "60"],
    "svgp_natgrad": ["--n", "2048", "--iters", "150"],
    "fleet": ["--models", "8", "--n", "24", "--iters", "200"],
    "serving_export": ["--iters", "300", "--n", "24"],
    "heteroscedastic": ["--iters", "400", "--n", "48"],
    "multioutput": ["--iters", "500", "--n", "40"],
    "deep_gp": ["--iters", "600", "--n", "120", "--minibatch", "64"],
    "gplvm": ["--iters", "800", "--n", "300", "--minibatch", "64"],
    "svgp_likelihoods": ["--n", "2000", "--iters", "800",
                         "--minibatch", "256"],
    "bayes_hypers_sparse": ["--n", "1500", "--m", "12", "--samples", "60",
                            "--chains", "4"],
}


def _load(path):
    spec = importlib.util.spec_from_file_location(path.stem, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_main_runs(path):
    mod = _load(path)
    assert hasattr(mod, "main")
    assert path.stem in TINY_ARGV, (
        "add a tiny-argv entry for new example %s" % path.name
    )
    mod.main(TINY_ARGV[path.stem])
