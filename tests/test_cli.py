"""CLI entry-point smoke tests, run in-process on TINY geometry with
synthetic data (the multi-device conftest mesh exercises auto mesh
selection too)."""

import os

import numpy as np
import pytest


DATE_ARGS = [
    "--set", "data.train_start=20150101", "--set", "data.train_end=20150102",
    "--set", "data.val_start=20150104", "--set", "data.val_end=20150105",
    "--set", "data.test_start=20150106", "--set", "data.test_end=20150107",
]


def _args(tmp_path, name, *extra):
    return (["--tiny", "--synthetic", "--type_net", name,
             "--set", f"output_path={tmp_path}"] + DATE_ARGS + list(extra))


def test_evaluate_cli(tmp_path):
    from pangu_tpu.cli.evaluate import main
    rc = main(_args(tmp_path, "ev", "--limit", "1", "--no-viz"))
    assert rc == 0
    csvs = os.listdir(tmp_path / "ev" / "24" / "csv")
    assert len(csvs) == 12


def test_convert_weights_cli_and_orbax_load(tmp_path):
    import torch
    import jax
    from pangu_tpu.config import TINY
    from pangu_tpu.models import pangu, convert as C
    from pangu_tpu.cli.convert_weights import main as conv_main
    from pangu_tpu.cli.evaluate import main as eval_main

    params = pangu.init_params(jax.random.PRNGKey(4), TINY)
    sd = {k: torch.from_numpy(np.copy(v))
          for k, v in C.export_torch_state_dict(params, TINY).items()}
    pth = str(tmp_path / "ref.pth")
    torch.save({"model": sd}, pth)

    out = str(tmp_path / "orbax")
    assert conv_main(["--tiny", "--input", pth, "--output", out]) == 0
    assert os.path.isdir(out)

    rc = eval_main(_args(tmp_path, "ev2", "--limit", "1", "--no-viz",
                         "--pretrained", out))
    assert rc == 0


def test_finetune_cli_smoke(tmp_path):
    from pangu_tpu.cli.finetune import main
    rc = main(_args(tmp_path, "ft", "--smoke",
                    "--set", "train.batch_size=2"))
    assert rc == 0
    run = tmp_path / "ft" / "24"
    assert (run / "models").is_dir()
    assert (run / "test" / "csv").is_dir()
    assert (run / "ft.log").exists()


def test_lora_cli_smoke(tmp_path):
    from pangu_tpu.cli.lora_tune import main
    rc = main(_args(tmp_path, "lt", "--smoke", "--rank", "4",
                    "--set", "train.batch_size=2"))
    assert rc == 0
    run = tmp_path / "lt" / "24"
    assert (run / "models" / "lora_adapter").is_dir()
    assert (run / "models" / "merged").is_dir()


def test_inference_cli_smoke(tmp_path):
    from pangu_tpu.cli.inference import main
    rc = main(_args(tmp_path, "inf", "--horizon", "48", "--limit", "1"))
    assert rc == 0
    import pandas as pd
    df = pd.read_csv(tmp_path / "inf" / "48" / "csv" / "acc_surface.csv",
                     index_col=0)
    assert df.shape[1] == 4


def test_inference_rejects_bad_horizon(tmp_path):
    from pangu_tpu.cli.inference import main
    with pytest.raises(SystemExit):
        main(_args(tmp_path, "bad", "--horizon", "36"))


def test_inference_cli_hierarchy(tmp_path):
    """--models hierarchy path: 30 h = 24 + 6 with two (random-init)
    models; validates greedy scheduling end-to-end."""
    from pangu_tpu.cli.inference import main
    rc = main(_args(tmp_path, "hier", "--horizon", "30",
                    "--models", "24=,6=", "--limit", "1",
                    "--set", "data.test_end=20150109"))
    assert rc == 0
    import pandas as pd
    df = pd.read_csv(tmp_path / "hier" / "30" / "csv" / "rmse_surface.csv",
                     index_col=0)
    assert len(df) == 1


def test_profile_step_cli(tmp_path):
    from pangu_tpu.cli.profile_step import main
    rc = main(["--tiny", "--steps", "2"])
    assert rc == 0


def test_parity_check_cli(tmp_path):
    import numpy as np
    import jax
    from pangu_tpu.cli.parity_check import main
    from pangu_tpu.config import TINY
    from pangu_tpu.models import pangu
    from pangu_tpu.data.constants import get_constants, denorm_data
    import jax.numpy as jnp

    # build frame + self-golden with the same random init -> must PASS
    rng = np.random.default_rng(0)
    upper = rng.normal(size=(5, TINY.levels, TINY.lat, TINY.lon)
                       ).astype(np.float32)
    surface = rng.normal(size=(4, TINY.lat, TINY.lon)).astype(np.float32)
    frame = tmp_path / "frame.npz"
    np.savez(frame, upper=upper, surface=surface)

    params = pangu.init_params(jax.random.PRNGKey(0), TINY)
    consts = {k: jnp.asarray(v) for k, v in get_constants(None, TINY).items()}
    ou, os_ = pangu.forward(params, jnp.asarray(upper)[None],
                            jnp.asarray(surface)[None], consts, TINY)
    ou, os_ = denorm_data(ou, os_, consts)
    golden = tmp_path / "golden.npz"
    np.savez(golden, out_upper=np.asarray(ou[0]),
             out_surface=np.asarray(os_[0]))

    rc = main(["--tiny", "--frame", str(frame), "--golden", str(golden)])
    assert rc == 0

    # corrupt the golden -> must FAIL
    np.savez(golden, out_upper=np.asarray(ou[0]) * 1.5,
             out_surface=np.asarray(os_[0]))
    rc = main(["--tiny", "--frame", str(frame), "--golden", str(golden)])
    assert rc == 1
