"""CLI entry point: ``python -m fourierflow_tpu.commands <cmd> ...``.

Equivalent of the reference's typer app
(reference:fourierflow/commands/__main__.py): train / test / predict /
generate / infer, built on argparse (typer is not vendored here).
"""

import argparse
import logging
import sys


def _add_common(p):
    p.add_argument("config_path", help="experiment config YAML")
    p.add_argument("overrides", nargs="*", help="dotted-path overrides key=value")
    p.add_argument("--trial", type=int, default=0)


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s: %(message)s"
    )
    parser = argparse.ArgumentParser(prog="fourierflow_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="train an experiment config")
    _add_common(p_train)
    p_train.add_argument("--checkpoint-path", default=None)
    p_train.add_argument("--no-test", action="store_true")
    p_train.add_argument("--debug", action="store_true",
                         help="disable jit for step-through debugging")
    p_train.add_argument("--force", action="store_true",
                         help="overwrite existing trial results")
    p_train.add_argument("--resume", action="store_true",
                         help="resume from the trial's last checkpoint")
    p_train.add_argument("--profile-dir", default=None,
                         help="capture a jax.profiler trace of the fit "
                              "into this directory")

    p_test = sub.add_parser("test", help="evaluate a checkpoint")
    _add_common(p_test)
    p_test.add_argument("--checkpoint-path", default=None,
                        help="defaults to the newest trial checkpoint")
    p_test.add_argument(
        "--torch-checkpoint", default=None,
        help="reference (PyTorch Lightning) .ckpt to evaluate instead")

    p_predict = sub.add_parser("predict", help="inference timing benchmark")
    p_predict.add_argument("config_path", nargs="?", default=None,
                           help="experiment config (omit to time the DNS baseline)")
    p_predict.add_argument("overrides", nargs="*")
    p_predict.add_argument("--trial", type=int, default=0)
    p_predict.add_argument("--checkpoint-path", default=None)

    p_gen = sub.add_parser("generate", help="generate datasets")
    gen_sub = p_gen.add_subparsers(dest="generator", required=True)
    p_kol = gen_sub.add_parser("kolmogorov")
    p_kol.add_argument("config_path")
    p_kol.add_argument("overrides", nargs="*")
    p_ns = gen_sub.add_parser("navier-stokes")
    p_ns.add_argument("path")
    for name, typ, default in [
        ("n-train", int, 1000), ("n-valid", int, 200), ("n-test", int, 200),
        ("s", int, 256), ("t", float, 20.0), ("steps", int, 20),
        ("mu", float, 1e-5), ("mu-min", float, 1e-5), ("mu-max", float, 1e-5),
        ("seed", int, 23893), ("delta", float, 1e-4), ("batch-size", int, 50),
        ("force", str, "li"), ("cycles", int, 2), ("scaling", float, 0.1),
        ("t-scaling", float, 0.2),
    ]:
        p_ns.add_argument(f"--{name}", type=typ, default=default)
    p_ns.add_argument("--varying-force", action="store_true")

    p_infer = sub.add_parser("infer", help="jitted rollout inference benchmark")
    _add_common(p_infer)
    p_infer.add_argument("--checkpoint-path", default=None)
    p_infer.add_argument(
        "--torch-checkpoint", default=None,
        help="reference (PyTorch Lightning) .ckpt to import instead of a "
             "native checkpoint (ref commands/infer.py:91-143)")
    p_infer.add_argument("--n-steps", type=int, default=100)

    p_export = sub.add_parser(
        "export", help="serialize the rollout as a StableHLO serving artifact")
    p_export.add_argument("config_path", help="experiment config YAML")
    p_export.add_argument("out_path")
    p_export.add_argument("overrides", nargs="*",
                          help="dotted-path overrides key=value")
    p_export.add_argument("--trial", type=int, default=0)
    p_export.add_argument("--checkpoint-path", default=None)
    p_export.add_argument("--torch-checkpoint", default=None)
    p_export.add_argument("--n-steps", type=int, default=20)
    p_export.add_argument("--batch-size", type=int, default=1)
    p_export.add_argument("--size", type=int, default=64)
    p_export.add_argument("--platforms", nargs="*", default=None,
                          help="lowering platforms, e.g. tpu cpu")
    p_export.add_argument("--precision", default=None,
                          choices=["default", "high", "highest"],
                          help="matmul precision baked into the artifact "
                               "(highest = full-f32 dots for reproducibility)")

    p_sample = sub.add_parser("sample", help="pickle one (batch, pred) pair")
    _add_common(p_sample)
    p_sample.add_argument("--checkpoint-path", default=None)
    p_sample.add_argument("--out-path", default=None)

    p_plot = sub.add_parser("plot", help="figures/tables from local run logs")
    p_plot.add_argument(
        "kind",
        choices=["layers", "correlation", "step-losses", "parameters",
                 "table", "heatmap", "energy", "flows", "superresolution",
                 "ablation", "tradeoff", "stepsize"],
    )
    p_plot.add_argument(
        "dataset", nargs="?", default=None,
        help="for 'table': one of torus_li/airfoil/elasticity/plasticity/"
             "pipe -> the paper's Table A.3-A.6 layout",
    )
    p_plot.add_argument("--root", default="configs")
    p_plot.add_argument("--sample-path", default=None)
    p_plot.add_argument("--out-path", default=None)
    p_plot.add_argument("--latex", action="store_true",
                        help="emit the reference's LaTeX rows for tables")
    p_plot.add_argument(
        "--inputs", nargs="+", default=None,
        help="for 'energy'/'flows': name=path.h5 prediction/trajectory "
             "files; for 'tradeoff': label=runtime DNS baseline points",
    )
    p_plot.add_argument("--times", type=int, nargs="+", default=None,
                        help="for 'flows': time indices (columns)")
    p_plot.add_argument("--tail", type=int, default=80,
                        help="for 'energy': trailing time window to average")
    p_plot.add_argument("--sample", type=int, default=0,
                        help="for 'flows': sample index")
    p_plot.add_argument("--train-size", type=int, default=64,
                        help="for 'superresolution': the checkpoint's "
                             "training grid size (marks the figure)")
    p_plot.add_argument("--xlabel", default="parameter",
                        help="for 'ablation': swept-parameter axis label")
    p_plot.add_argument("--metrics", nargs="+", default=None,
                        help="for 'ablation': campaign_log.jsonl keys to "
                             "plot (default valid_time_until, train_loss)")

    p_conv = sub.add_parser("convert", help="convert meshgraphnets TFRecords to HDF5")
    conv_sub = p_conv.add_subparsers(dest="converter", required=True)
    p_cf = conv_sub.add_parser("cylinder-flow")
    p_cf.add_argument("--data-dir", default="data/meshgraphnets/cylinder_flow")
    p_cf.add_argument("--out", default="data/meshgraphnets/cylinder_flow/cylinder_flow.h5")

    p_cfg = sub.add_parser("configs", help="list or export registry experiments")
    p_cfg.add_argument("action", choices=["list", "export"])
    p_cfg.add_argument("name", nargs="?", default=None)
    p_cfg.add_argument("--out-dir", default="configs")

    p_dl = sub.add_parser("download", help="download datasets")
    dl_sub = p_dl.add_subparsers(dest="dataset", required=True)
    p_dl_fno = dl_sub.add_parser("fno")
    p_dl_fno.add_argument("--data-root", default="$DATA_ROOT")
    p_dl_geo = dl_sub.add_parser("geo-fno")
    p_dl_geo.add_argument("--data-root", default="$DATA_ROOT")
    p_dl_mgn = dl_sub.add_parser("meshgraphnets")
    p_dl_mgn.add_argument("--data-dir", default="data/meshgraphnets")
    p_dl_mgn.add_argument("--settings", nargs="*", default=None)

    args = parser.parse_args(argv)

    if args.command == "train":
        if args.debug:
            import jax

            jax.config.update("jax_disable_jit", True)
        from .train import main as train_main

        train_main(
            args.config_path,
            overrides=args.overrides,
            trial=args.trial,
            checkpoint_path=args.checkpoint_path,
            no_test=args.no_test,
            force=args.force,
            resume=args.resume,
            profile_dir=args.profile_dir,
        )
    elif args.command == "test":
        from .test import main as test_main

        test_main(args.config_path, args.checkpoint_path, overrides=args.overrides,
                  trial=args.trial, torch_checkpoint=args.torch_checkpoint)
    elif args.command == "predict":
        from .predict import main as predict_main

        predict_main(args.config_path, args.checkpoint_path, overrides=args.overrides)
    elif args.command == "infer":
        from .infer import main as infer_main

        infer_main(args.config_path, args.checkpoint_path,
                   overrides=args.overrides, n_steps=args.n_steps,
                   trial=args.trial, torch_checkpoint=args.torch_checkpoint)
    elif args.command == "export":
        from .export import main as export_main

        export_main(
            args.config_path, args.out_path,
            checkpoint_path=args.checkpoint_path,
            torch_checkpoint=args.torch_checkpoint,
            overrides=args.overrides, n_steps=args.n_steps,
            batch_size=args.batch_size, size=args.size,
            platforms=args.platforms, trial=args.trial,
            precision=args.precision,
        )
    elif args.command == "sample":
        from .sample import main as sample_main

        sample_main(args.config_path, args.checkpoint_path,
                    overrides=args.overrides, trial=args.trial, out_path=args.out_path)
    elif args.command == "plot":
        from . import plot as plot_mod

        if args.kind == "heatmap":
            plot_mod.heatmap(args.sample_path)
        elif args.kind == "table":
            plot_mod.table(args.root, out_path=args.out_path,
                           dataset=args.dataset, latex=args.latex)
        elif args.kind == "layers":
            plot_mod.layers(args.root, out_path=args.out_path or "layers.png")
        elif args.kind == "step-losses":
            plot_mod.step_losses(args.root,
                                 out_path=args.out_path or "step_losses.png")
        elif args.kind == "parameters":
            plot_mod.parameters(args.root,
                                out_path=args.out_path or "parameters.png")
        elif args.kind == "energy":
            plot_mod.energy(args.inputs or [],
                            out_path=args.out_path or "energy.png",
                            tail=args.tail)
        elif args.kind == "flows":
            plot_mod.flows(args.inputs or [],
                           out_path=args.out_path or "samples.png",
                           sample=args.sample, times=args.times)
        elif args.kind == "superresolution":
            plot_mod.superresolution(
                args.dataset or "superres_results.json",
                out_path=args.out_path or "superresolution.png",
                train_size=args.train_size)
        elif args.kind == "ablation":
            plot_mod.ablation(args.inputs or [],
                              out_path=args.out_path or "ablation.png",
                              xlabel=args.xlabel, metrics=args.metrics)
        elif args.kind == "tradeoff":
            plot_mod.tradeoff(args.dataset or "/root/data/kochkov512",
                              out_path=args.out_path or "tradeoff.png",
                              dns=args.inputs)
        elif args.kind == "stepsize":
            plot_mod.stepsize(args.inputs or [], dns_path=args.dataset,
                              out_path=args.out_path or "stepsize.png")
        else:
            plot_mod.correlation(args.root, out_path=args.out_path or "correlation.png")
    elif args.command == "convert":
        if args.converter == "cylinder-flow":
            from .convert import cylinder_flow

            cylinder_flow(args.data_dir, args.out)
    elif args.command == "configs":
        from ..experiments import experiment_names, materialize

        if args.action == "list":
            for n in experiment_names():
                print(n)
        else:
            if args.name is None:
                raise SystemExit("export needs an experiment name")
            print(materialize(args.name, args.out_dir))
    elif args.command == "download":
        from . import download as dl

        if args.dataset == "fno":
            dl.fno(args.data_root)
        elif args.dataset == "geo-fno":
            dl.geo_fno(args.data_root)
        elif args.dataset == "meshgraphnets":
            dl.meshgraphnets(args.data_dir, args.settings)
    elif args.command == "generate":
        if args.generator == "kolmogorov":
            from .generate import kolmogorov

            kolmogorov(args.config_path, overrides=args.overrides)
        elif args.generator == "navier-stokes":
            from .generate import navier_stokes

            navier_stokes(
                args.path,
                n_train=args.n_train,
                n_valid=args.n_valid,
                n_test=args.n_test,
                s=args.s,
                t=args.t,
                steps=args.steps,
                mu=args.mu,
                mu_min=args.mu_min,
                mu_max=args.mu_max,
                seed=args.seed,
                delta=args.delta,
                batch_size=args.batch_size,
                force=args.force,
                cycles=args.cycles,
                scaling=args.scaling,
                t_scaling=args.t_scaling,
                varying_force=args.varying_force,
            )


if __name__ == "__main__":
    main(sys.argv[1:])
