"""CLI driver protocol tests (reference train.py / test.py surfaces)."""
import numpy as np

from sbl_for_multilingual_lip_reading_tpu import config as C
from sbl_for_multilingual_lip_reading_tpu.cli import (build_argparser,
                                                      config_from_args,
                                                      make_datasets)


def _args(argv):
    return build_argparser().parse_args(argv)


def test_config_from_args_new_flags():
    args = _args(["--secondary-batch-size", "3", "--workload", "classify"])
    cfg = config_from_args(args)
    assert cfg.secondary_batch_size == 3
    assert args.profile_dir is None and args.lrw1000_eval_manifest is None


def test_remat_frontend_flag_resolution():
    """Config default is stored-activations (False); --remat-frontend and
    --cache-on-device opt back into the recompute-for-memory mode, and an
    explicit --no-remat-frontend wins over --cache-on-device."""
    assert config_from_args(_args([])).remat_frontend is False
    assert config_from_args(_args(["--remat-frontend"])).remat_frontend is True
    assert config_from_args(
        _args(["--cache-on-device"])).remat_frontend is True
    assert config_from_args(
        _args(["--cache-on-device", "--no-remat-frontend"])
    ).remat_frontend is False


def test_make_datasets_synthetic_val_test_disjoint():
    cfg = C.tiny_test("sbl")
    args = _args(["--synthetic", "--synthetic-size", "8"])
    _, val = make_datasets(cfg, args, eval_split="val")
    _, tst = make_datasets(cfg, args, eval_split="test")
    a = val["lrw"][0]["clip_u8"]
    b = tst["lrw"][0]["clip_u8"]
    assert not np.array_equal(a, b)  # different seeds => disjoint sets


def test_make_datasets_real_layout_protocol(tmp_path):
    """run_test protocol (reference test.py:51-311): train data always from
    the train split/manifest (also the bigram corpus -- no test leakage);
    eval datasets follow eval_split, including an LRW-1000 eval manifest."""
    root = tmp_path / "lrw"
    for word in ["ABOUT", "WORLD"]:
        for split, n in [("train", 3), ("val", 2), ("test", 1)]:
            d = root / word / split
            d.mkdir(parents=True)
            for k in range(n):
                np.save(d / f"{word}_{k:05d}.npy",
                        np.zeros((4, 16, 16), np.uint8))
    trn = tmp_path / "trn1.txt"
    trn.write_text("dir1,w1,x,zhong guo,0.0,0.4\n"
                   "dir2,w2,x,ni hao,0.0,0.4\n")
    tst = tmp_path / "tst1.txt"
    tst.write_text("dir3,w3,x,zhong guo,0.0,0.4\n")
    (tmp_path / "images" / "dir1").mkdir(parents=True)

    cfg = C.tiny_test("sbl")
    import dataclasses
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, frames=4, raw_size=16))
    args = _args(["--lrw-path", str(root),
                  "--lrw1000-images", str(tmp_path / "images"),
                  "--lrw1000-manifest", str(trn),
                  "--lrw1000-eval-manifest", str(tst)])
    train, valid = make_datasets(cfg, args, eval_split="test")
    # train = LRW train split (3/word) + LRW-1000 train manifest (2 rows)
    assert len(train) == 6 + 2
    assert len(valid["lrw"]) == 2      # test split, 1/word
    assert len(valid["lrw1000"]) == 1  # tst1.txt row
    # training-time validation reads the val split instead
    _, valid_tr = make_datasets(cfg, args, eval_split="val")
    assert len(valid_tr["lrw"]) == 4   # val split, 2/word
