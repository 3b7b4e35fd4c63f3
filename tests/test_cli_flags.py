"""Flag-surface parity: defaults must match the reference CLIs."""

from acezero_tpu.cli.ace_zero_cli import build_parser as ace_zero_parser
from acezero_tpu.cli.eval_poses_cli import build_parser as eval_parser
from acezero_tpu.cli.register_cli import build_parser as register_parser
from acezero_tpu.cli.train_ace_cli import build_parser as train_parser


def test_ace_zero_defaults_match_reference():
    args = ace_zero_parser().parse_args(["glob", "out"])
    # reference ace_zero.py:44-158 defaults
    assert args.iterations_max == 100
    assert args.registration_threshold == 0.99
    assert args.relative_registration_threshold == 0.01
    assert args.final_refine is True and args.final_refit is True
    assert args.final_refit_posewait == 5000
    assert args.refit_iterations == 25000
    assert args.registration_confidence == 500
    assert args.try_seeds == 5
    assert args.seed_iterations == 10000
    assert args.warmstart is True
    assert args.refinement == "mlp"
    assert args.refinement_ortho == "gram-schmidt"
    assert args.pose_refinement_lr == 0.001
    assert args.refine_calibration is True
    assert args.use_external_focal_length == -1
    assert args.learning_rate_schedule == "1cyclepoly"
    assert args.learning_rate_max == 0.003
    assert args.cooldown_iterations == 5000
    assert args.cooldown_threshold == 0.7
    assert args.image_resolution == 480
    assert args.num_head_blocks == 1
    assert args.max_dataset_passes == 10
    assert args.repro_loss_type == "tanh"
    assert args.repro_loss_hard_clamp == 1000
    assert args.repro_loss_soft_clamp == 50
    assert args.aug_rotation == 15
    assert args.ransac_iterations == 32
    assert args.ransac_threshold == 10
    assert args.random_seed == 1305


def test_train_ace_defaults_match_reference():
    args = train_parser().parse_args(["glob", "out.pt", "--use_pose_seed", "0.5"])
    # reference train_ace.py:30-228 defaults
    assert args.base_seed == 2089
    assert args.ace_pose_file_conf_threshold == 1000
    assert args.num_head_blocks == 1
    assert args.use_half is True and args.use_homogeneous is True
    assert args.learning_rate_min == 0.0005
    assert args.learning_rate_max == 0.005
    assert args.learning_rate_schedule == "circle"
    assert args.learning_rate_warmup_iterations == 1000
    assert args.learning_rate_cooldown_iterations == 5000
    assert args.learning_rate_cooldown_trigger_px_threshold == 10
    assert args.learning_rate_cooldown_trigger_percent_threshold == 0.7
    assert args.max_training_buffer_size == 8_000_000
    assert args.max_dataset_passes == 10
    assert args.samples_per_image == 1024
    assert args.batch_size == 5120
    assert args.iterations == 25000
    assert args.repro_loss_type == "dyntanh"
    assert args.repro_loss_schedule == "circle"
    assert args.depth_min == 0.1 and args.depth_max == 1000 and args.depth_target == 10
    assert args.use_aug is True and args.aug_rotation == 15 and args.aug_scale == 1.5
    assert args.pose_refinement == "none"
    assert args.pose_refinement_weight == 0.1
    assert args.pose_refinement_lr == 0.001


def test_register_defaults_match_reference():
    args = register_parser().parse_args(["glob", "net.pt"])
    # reference register_mapping.py:58-115 defaults
    assert args.image_resolution == 480
    assert args.hypotheses == 64
    assert args.threshold == 10
    assert args.inlieralpha == 100
    assert args.maxpixelerror == 100
    assert args.base_seed == 1305
    assert args.confidence_threshold == 1000
    assert args.max_estimates == -1
    assert args.use_external_focal_length == -1


def test_eval_defaults_match_reference():
    args = eval_parser().parse_args(["poses.txt", "gt_glob"])
    # reference eval_poses.py:39-52 defaults
    assert args.estimate_alignment is True
    assert args.estimate_alignment_scale is True
    assert args.estimate_alignment_conf_threshold == 500
    assert args.pose_error_thresh_t == 0.05
    assert args.pose_error_thresh_r == 5
