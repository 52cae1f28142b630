"""Round-5 regression tests: ADC densification defaults, glue kernels."""

import numpy as np
import pytest

from divshot_tpu.core.config import (TrainConfig, DensifyStrategy,
                                     auto_tune_config, config_from_flags)


def test_adc_strategy_defaults_pairing():
    """r4 ADC leg saturated cap_max in 1.3K iters: the scale2d split was on
    by default and absgrad ran against the signed-grad threshold. Classic
    ADC must resolve to signed grads @2e-4, ADC+ to absgrad @8e-4, and the
    scale2d trigger must stay disabled unless explicitly requested."""
    # classic ADC (densifyStrategy 0)
    cfg = auto_tune_config(config_from_flags(
        ["--source_path", "x", "--densify_strategy", "0"]), 100)
    assert cfg.densify.strategy == DensifyStrategy.ADC
    assert cfg.densify.use_abs_grad is False
    assert cfg.densify.grow_grad2d == pytest.approx(2e-4)
    assert cfg.densify.refine_scale2d_stop_iter == 0

    # ADC+ (densifyStrategy 2): absgrad stays on, threshold scales 4x
    cfg2 = auto_tune_config(config_from_flags(
        ["--source_path", "x", "--densify_strategy", "2"]), 100)
    assert cfg2.densify.use_abs_grad is True
    assert cfg2.densify.grow_grad2d == pytest.approx(8e-4)

    # explicit user values always win
    cfg3 = auto_tune_config(config_from_flags(
        ["--source_path", "x", "--densify_strategy", "2",
         "--grow_grad2d", "3e-4"]), 100)
    assert cfg3.densify.grow_grad2d == pytest.approx(3e-4)

    # MCMC (default) is untouched by the pairing logic
    cfg4 = auto_tune_config(config_from_flags(["--source_path", "x"]), 100)
    assert cfg4.densify.strategy == DensifyStrategy.MCMC
    assert cfg4.densify.grow_grad2d == pytest.approx(2e-4)
