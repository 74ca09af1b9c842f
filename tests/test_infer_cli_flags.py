"""Pin cli/infer.py's flag surface to the reference launch.

The reference ships ONE launch line (scripts/run_in_the_wild.sh:39):
`--adaptive --use_fp16 --num_timesteps 32` with NO guidance flags, against
defaults guidance_scale=1.0 guidance_scale2=1.0 rescale_timesteps=100
(inference_dpm_latent.py:276-316). That flag set must parse on our CLI and
map to the single-conditional-pass CFG branch (model/dpmsolver.py:329-330).
"""

import jax.numpy as jnp
import pytest

from gvfdiffusion_tpu.cli.infer import build_parser, pipeline_config_from_args


# the reference launch's inference-relevant flags, ours-compatible verbatim
REFERENCE_LAUNCH = ["--input", "x.npz", "--adaptive", "--use_fp16",
                    "--num_timesteps", "32"]


def test_defaults_match_reference():
    args, _ = build_parser().parse_known_args(["--input", "x.npz"])
    assert args.guidance_scale == 1.0
    assert args.guidance_scale2 == 1.0
    assert args.rescale_timesteps == 100
    assert args.order == 2
    assert not args.adaptive


def test_reference_launch_flags_parse_and_select_single_pass():
    args, extra = build_parser().parse_known_args(REFERENCE_LAUNCH)
    assert extra == []  # every shipped flag is consumed, not ignored
    cfg = pipeline_config_from_args(args, num_frames=32, num_latents=512,
                                    latent_dim=16)
    assert cfg.method == "adaptive"
    assert cfg.steps == 100
    # single-pass CFG: the pipeline's 3-way-batch branch keys off this
    assert cfg.guidance_scale == 1.0 and cfg.guidance_scale2 == 1.0


def test_single_pass_branch_skips_cfg_batch():
    # the pipeline gate at pipelines/video_to_4d.py:122 — 1.0/1.0 must NOT
    # build the 3-way cross-KV batch
    from gvfdiffusion_tpu.pipelines.video_to_4d import VideoTo4DConfig

    cfg = VideoTo4DConfig()
    assert cfg.guidance_scale == 1.0 and cfg.guidance_scale2 == 1.0
    assert not (cfg.guidance_scale != 1.0 or cfg.guidance_scale2 != 1.0)


def test_steps_alias():
    args, _ = build_parser().parse_known_args(
        ["--input", "x.npz", "--steps", "8"])
    cfg = pipeline_config_from_args(args, 4, 8, 4)
    assert cfg.steps == 8


def test_num_timesteps_mismatch_is_an_error(tmp_path):
    import numpy as np

    from gvfdiffusion_tpu.cli import infer

    npz = tmp_path / "in.npz"
    np.savez(npz, canonical_gs=np.zeros((16, 14), np.float32),
             cond_images=np.zeros((4, 5, 16), np.float32))
    with pytest.raises(SystemExit):
        infer.main(["--input", str(npz), "--num_timesteps", "32"])
