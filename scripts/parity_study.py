"""At-scale accuracy parity study: stair-tpu vs the PyTorch reference.

Builds a large synthetic AGQA-format world (>=10k questions, >=1k held-out
test), trains BOTH implementations on identical records/features, and
reports test accuracy with binomial (Wilson) confidence intervals, a PAIRED
difference CI on the shared test set, and the novel_comp / more_steps
generalization splits (semantics mirror utils/agqa_lite.py:135-138:
novel_comp questions hold out template x argument compositions from train;
more_steps marks the structurally deepest programs, mostly held out).

The reference run reproduces the round-1 recipe: its own trainer
(train_module.py) driven on our pickles, with two environment patches it
needs to run at all — an nltk stopword stub (no corpora installed) and a
tolerant word2id for its FilterFrame criterion (it looks up underscore
class names while its own executor emits space-normalized ones).

Usage:
  python -m scripts.parity_study --func build   --root /tmp/parity [...]
  python -m scripts.parity_study --func ours    --root /tmp/parity
  python -m scripts.parity_study --func reference --root /tmp/parity
  python -m scripts.parity_study --func report  --root /tmp/parity
"""

from __future__ import annotations

import argparse
import json
import math
import os
import pickle
import random
import sys
import time

import numpy as np

REF_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# World construction + splits
# ---------------------------------------------------------------------------

def build(args):
    from stair_tpu.programs import preprocess
    from stair_tpu.programs.scene_graph import SceneGraphExecutor
    from stair_tpu.testing.synthetic import make_world

    t0 = time.time()
    w = make_world(
        args.root, num_videos=args.num_videos,
        questions_per_video=args.questions_per_video,
        num_frames=args.num_frames, seed=args.seed,
    )
    with open(w["questions"]) as f:
        qs = json.load(f)
    print(f"world: {len(qs)} questions over {args.num_videos} videos "
          f"({time.time() - t0:.0f}s)")

    # Split. novel_comp questions NEVER train (that's the point of the
    # split); more_steps questions are 80% held out so the deep modules
    # still receive some supervision, mirroring AGQA2's more-steps-at-test
    # regime. Remaining test slots fill randomly.
    rng = random.Random(args.seed + 1)
    ids = sorted(qs)
    novel = [q for q in ids if qs[q]["novel_comp"]]
    deep = [q for q in ids if qs[q]["more_steps"] and not qs[q]["novel_comp"]]
    rest = [q for q in ids if q not in set(novel) | set(deep)]
    rng.shuffle(deep)
    rng.shuffle(rest)
    deep_test = deep[: int(0.8 * len(deep))]
    test = set(novel) | set(deep_test)
    want_test = max(args.test_size, len(test))
    fill = [q for q in rest if q not in test]
    test |= set(fill[: want_test - len(test)])
    remaining = [q for q in ids if q not in test]
    rng.shuffle(remaining)
    n_valid = args.valid_size
    valid = set(remaining[:n_valid])
    train = [q for q in remaining[n_valid:]]
    print(f"split: train={len(train)} valid={len(valid)} test={len(test)} "
          f"(novel_comp={len(novel)}, more_steps-in-test={len(deep_test)})")

    preprocess.set_executor(
        SceneGraphExecutor(w["scene_graphs"], w["id2word"], w["word2id"])
    )
    out = os.path.join(args.root, "out")
    os.makedirs(out, exist_ok=True)
    splits = {"train": train, "valid": sorted(valid), "test": sorted(test)}
    meta = {}
    for name, qids in splits.items():
        t1 = time.time()
        recs = preprocess.convert_split(
            [dict(qs[q], qa_id=q) for q in qids],
            num_workers=args.num_workers,
        )
        with open(os.path.join(out, f"{name}.pkl"), "wb") as f:
            pickle.dump(recs, f)
        print(f"{name}: {len(recs)}/{len(qids)} converted "
              f"({time.time() - t1:.0f}s)")
        meta[name] = len(recs)
    labels = {
        q: {"novel_comp": qs[q]["novel_comp"],
            "more_steps": qs[q]["more_steps"]}
        for q in ids
    }
    with open(os.path.join(args.root, "labels.json"), "w") as f:
        json.dump(labels, f)
    with open(os.path.join(args.root, "build_meta.json"), "w") as f:
        json.dump(meta, f)


def _common_flags(args):
    out = os.path.join(args.root, "out")
    return [
        "--rgb-path", os.path.join(args.root, "features"),
        "--glove-filename", os.path.join(args.root, "glove.txt"),
        "--train-filename", os.path.join(out, "train.pkl"),
        "--valid-filename", os.path.join(out, "valid.pkl"),
        "--test-filename", os.path.join(out, "test.pkl"),
        "--video-secs-path", os.path.join(args.root, "video_secs.json"),
        "--word2id-filename", os.path.join(args.root, "IDX.json"),
        "--vocab-filename", os.path.join(out, "vocab.json"),
        "--hidden-size", str(args.hidden), "--text-size", "50",
        "--max-video-length", str(args.frames), "--video-size", "64",
        "--lr", str(args.lr),
    ]


# ---------------------------------------------------------------------------
# stair-tpu run
# ---------------------------------------------------------------------------

def ours(args):
    from stair_tpu.train import evaluate as eval_cli
    from stair_tpu.train import loop
    from stair_tpu.train.args import get_args

    run = os.path.join(args.root, args.ours_run)
    extra = []
    if args.encoder != "lstm":
        extra += ["--encoder", args.encoder]
    if args.filter_attention != "parity":
        extra += ["--filter-attention", args.filter_attention]
    if args.contrastive_window:
        extra += ["--contrastive-window", str(args.contrastive_window)]
    if args.rand_seed != 1:
        extra += ["--rand-seed", str(args.rand_seed)]
    steps_per_epoch = max(1, args_count(args, "train") // args.batch_size)
    targs = get_args(_common_flags(args) + extra + [
        "--output", run, "--num-epochs", str(args.ours_epochs),
        "--batch-size", str(args.batch_size),
        "--evaluate-interval", str(steps_per_epoch),
        "--report-interval", str(max(1, steps_per_epoch // 2)),
        "--scheduler-total-iters",
        str(steps_per_epoch * args.ours_epochs),
    ])
    t0 = time.time()
    best = loop.main(targs)
    print(f"ours: best valid acc {best:.4f} ({time.time() - t0:.0f}s)")

    eargs = get_args(_common_flags(args) + extra + [
        "--output", run,
        "--model-ckpt", os.path.join(run, "best_model"),
        "--evaluate-func", "acc", "--result-filename", "test_preds.json",
        "--batch-size", str(args.batch_size),
    ])
    acc = eval_cli.main(eargs)
    print(f"ours: test acc {acc:.4f}")


def args_count(args, split):
    with open(os.path.join(args.root, "build_meta.json")) as f:
        return json.load(f)[split]


# ---------------------------------------------------------------------------
# Neural parser in the measured loop (VERDICT r4 #3)
# ---------------------------------------------------------------------------

def parser_loop(args):
    """Train the seq2seq program parser on this world and measure it IN THE
    LOOP: (a) program exact-match + validity rates, (b) NMN test accuracy
    with *generated* programs via the upgrade path (vs ground-truth
    programs, same checkpoint), (c) batched beam-decode throughput.

    Mirrors the reference's deployed configuration (README.md:87-135: LSTM
    parser -> program layouts -> NMN inference). Requires a finished
    ``ours`` run (the NMN checkpoint under ``<root>/<ours_run>``)."""
    from types import SimpleNamespace

    from stair_tpu.programs import preprocess as prep
    from stair_tpu.seq2seq import train as parser_cli
    from stair_tpu.train import evaluate as eval_cli
    from stair_tpu.train.args import get_args

    out = os.path.join(args.root, "out")
    run = os.path.join(args.root, args.ours_run)
    parser_dir = os.path.join(args.root, f"parser_{args.parser_arch}")
    results = {"arch": args.parser_arch, "epochs": args.parser_epochs}

    t0 = time.time()
    parser_cli.main([
        "--func", "train", "--arch", args.parser_arch,
        "--train-filename", os.path.join(out, "train.pkl"),
        "--valid-filename", os.path.join(out, "valid.pkl"),
        "--output", parser_dir,
        "--num-epochs", str(args.parser_epochs),
        "--batch-size", "64", "--report-interval", "200",
    ])
    results["train_seconds"] = round(time.time() - t0, 1)

    # --- (a) exact match + (c) decode throughput -------------------------
    model, params, sv, tv = parser_cli.load_parser(parser_dir)
    pairs = parser_cli.load_pairs(os.path.join(out, "test.pkl"))
    da = SimpleNamespace(batch_size=256, beam_size=5,
                         max_src_len=32, max_tgt_len=48)
    # Warm pass compiles the beam scan; the timed pass measures the
    # batched decode rate the serving path would see.
    list(parser_cli.decode_beams(model, params, sv, tv, pairs[:256], da))
    t0 = time.time()
    decoded = list(parser_cli.decode_beams(model, params, sv, tv, pairs, da))
    dt = time.time() - t0
    results["decode_qps"] = round(len(pairs) / dt, 1)
    n_em = sum(
        1 for (qa, _q, beams), (_, _, gold, _) in zip(decoded, pairs)
        if beams and beams[0] == gold
    )
    em, em_lo, em_hi = wilson(n_em, len(pairs))
    results["exact_match_top1"] = round(em, 4)
    results["exact_match_ci95"] = [round(em_lo, 4), round(em_hi, 4)]

    tsv = os.path.join(parser_dir, "gen_test.tsv")
    with open(tsv, "w") as f:
        for qa_id, question, beams in decoded:
            for beam in beams:
                f.write("%s\t%s\t%s\n" % (qa_id, question, " ".join(beam)))
    va = SimpleNamespace(result_filename=tsv)
    top1_valid, any_valid = parser_cli.check_valid(va)
    results["valid_top1"] = round(top1_valid, 4)
    results["valid_any_beam"] = round(any_valid, 4)

    # --- (b) NMN accuracy with generated programs ------------------------
    gen_pkl = os.path.join(out, "test_generated.pkl")
    prep.main([
        "--func", "upgrade", "--generated-format", "huggingface",
        "--src-data-filename", os.path.join(out, "test.pkl"),
        "--dest-data-filename", gen_pkl, "--generated-filename", tsv,
    ])

    def nmn_acc(test_pkl, result_name):
        eargs = get_args(_common_flags(args) + [
            "--output", run,
            "--model-ckpt", os.path.join(run, "best_model"),
            "--evaluate-func", "acc",
            "--result-filename", result_name,
            "--batch-size", str(args.batch_size),
            "--test-filename", test_pkl,   # last --test-filename wins
        ] + (["--encoder", args.encoder]
             if args.encoder != "lstm" else [])
          + (["--filter-attention", args.filter_attention]
             if args.filter_attention != "parity" else [])
          + (["--contrastive-window", str(args.contrastive_window)]
             if args.contrastive_window else []))
        return eval_cli.main(eargs)

    acc_gold = float(
        nmn_acc(os.path.join(out, "test.pkl"), "test_preds_gold.json"))
    acc_gen = float(nmn_acc(gen_pkl, "test_preds_generated.json"))
    results["nmn_acc_gold_programs"] = round(acc_gold, 4)
    results["nmn_acc_generated_programs"] = round(acc_gen, 4)
    results["n_test"] = len(pairs)
    # Wilson CIs + the PAIRED gold-vs-generated accuracy delta on the
    # shared question set — the accuracy-parity obligation (r4 missing
    # #4), with the same statistical hygiene as the contrastive-window
    # study (r4 #10).
    for key, acc in (("gold", acc_gold), ("generated", acc_gen)):
        c = int(round(acc * len(pairs)))
        _, lo, hi = wilson(c, len(pairs))
        results[f"nmn_acc_{key}_ci95"] = [round(lo, 4), round(hi, 4)]
    try:
        g = _load_preds(os.path.join(run, "test_preds_gold.json"))
        gen = _load_preds(os.path.join(run, "test_preds_generated.json"))
        shared = sorted(set(g) & set(gen))
        diffs = np.asarray(
            [int(gen[qa][0] == gen[qa][1]) - int(g[qa][0] == g[qa][1])
             for qa in shared], np.float64)
        if len(diffs) >= 2:
            mean = float(diffs.mean())
            se = float(diffs.std(ddof=1) / math.sqrt(len(diffs)))
            results["paired_generated_minus_gold"] = {
                "n": len(diffs), "mean": round(mean, 4),
                "ci95": [round(mean - 1.96 * se, 4),
                         round(mean + 1.96 * se, 4)],
            }
    except FileNotFoundError:
        pass

    print("parser_loop:", json.dumps(results, indent=1))
    with open(os.path.join(args.root, "parser_loop.json"), "w") as f:
        json.dump(results, f, indent=1)
    # Merge into the repo PARITY.json when present.
    parity_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARITY.json")
    if os.path.exists(parity_path):
        with open(parity_path) as f:
            parity = json.load(f)
        parity.setdefault("parser_loop", {})[args.parser_arch] = results
        with open(parity_path, "w") as f:
            json.dump(parity, f, indent=1)
        print("merged into", parity_path)
    return results


# ---------------------------------------------------------------------------
# Reference run (PyTorch, batch-1 eager)
# ---------------------------------------------------------------------------

def _prepare_reference():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import nltk
    import nltk.corpus
    import nltk.tokenize

    class _SW:
        def words(self, lang):
            return []

    try:
        nltk.corpus.stopwords.words("english")
    except Exception:
        nltk.corpus.stopwords = _SW()
    try:
        nltk.tokenize.word_tokenize("probe sentence")
    except Exception:
        # No punkt data: give the reference the same deterministic fallback
        # tokenizer our dataset uses, so both models see identical tokens.
        from stair_tpu.programs.text import tokenize as _tok

        nltk.tokenize.word_tokenize = _tok
        nltk.word_tokenize = _tok


class _TolerantWord2Id(dict):
    """FilterFrame-criterion patch: the reference's symbolic executor emits
    space-normalized class names but the criterion looks them up raw."""

    def __missing__(self, key):
        alt = key.replace("_", " ")
        if alt in self:
            return self[alt]
        alt = key.replace(" ", "_")
        if alt in self:
            return self[alt]
        raise KeyError(key)


def reference(args):
    _prepare_reference()
    import torch

    torch.manual_seed(0)
    import train_module as ref_train
    from video_nmn.args import get_args as ref_get_args

    run = os.path.join(args.root, "reference")
    os.makedirs(run, exist_ok=True)
    train_n = args_count(args, "train")
    argv = _common_flags(args) + [
        "--output", run, "--num-epochs", str(args.ref_epochs),
        "--evaluate-interval", str(train_n),
        "--report-interval", str(max(1, train_n // 2)),
        "--scheduler-total-iters", str(train_n * args.ref_epochs),
    ]
    old_argv = sys.argv
    sys.argv = ["train_module.py"] + argv
    try:
        ref_args = ref_get_args()
    finally:
        sys.argv = old_argv

    # Patch the criterion's word2id after construction.
    orig_criterion = ref_train.CriterionByModule

    class PatchedCriterion(orig_criterion):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            if getattr(self, "word2id", None) is not None:
                self.word2id = _TolerantWord2Id(self.word2id)

    ref_train.CriterionByModule = PatchedCriterion
    t0 = time.time()
    ref_train.main(ref_args)
    print(f"reference: trained ({time.time() - t0:.0f}s)")


def reference_eval(args):
    _prepare_reference()
    import importlib.util

    import torch
    from torch.utils.data import DataLoader

    from video_nmn.args import get_args as ref_get_args
    from video_nmn.dataset import AGQADataset, collate_fn

    run = os.path.join(args.root, "reference")
    argv = _common_flags(args) + [
        "--output", run,
        "--model-ckpt", os.path.join(run, "best_model"),
        "--evaluate-func", "acc",
        "--result-filename", "test_preds.json",
    ]
    old_argv = sys.argv
    sys.argv = ["evaluate.py"] + argv
    try:
        ref_args = ref_get_args()
    finally:
        sys.argv = old_argv

    del importlib  # the reference's own evaluate.py argmaxes logits on
    # dim=1 while its model emits a flat [V] vector (released-code wart;
    # its evaluate entry also load_state_dicts a whole-pickled module) —
    # run the equivalent loop directly instead.

    # train_module.save_model pickles the WHOLE module (train_module.py:214).
    model = torch.load(
        os.path.join(run, "best_model", "pytorch_model.bin"),
        map_location="cpu", weights_only=False,
    )
    model.eval()
    ds = AGQADataset(ref_args, split="test")
    dl = DataLoader(ds, batch_size=1, shuffle=False, num_workers=0,
                    collate_fn=collate_fn)
    from video_nmn.dataset import to_device  # noqa: F401 (parity of device path)

    id2w = ds.answer_vocab["id2word"]
    unk = ds.answer_vocab["word2id"]["<UNK>"]
    preds_golds = {"preds": [], "golds": [], "qa_ids": []}
    correct = total = 0
    with torch.no_grad():
        for i, batch in enumerate(dl):
            if i % 500 == 0:
                print(f"reference eval: {i} examples")
            out = model(batch, return_res_by_step=False, test_mode=True)
            pred = int(torch.argmax(out["logits"]).item())
            gold = int(batch["answer"])
            correct += int(pred == gold and gold != unk)
            total += 1
            preds_golds["preds"].append(id2w[pred])
            preds_golds["golds"].append(id2w[gold])
            preds_golds["qa_ids"].append(batch["qa_id"])
    with open(os.path.join(run, "test_preds.json"), "w") as f:
        json.dump(preds_golds, f)
    acc = correct / max(total, 1)
    print(f"reference: test acc {acc:.4f} over {total}")


# ---------------------------------------------------------------------------
# Report
# ---------------------------------------------------------------------------

def wilson(correct, n, z=1.96):
    if n == 0:
        return (0.0, 0.0, 1.0)
    p = correct / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return (p, max(0.0, center - half), min(1.0, center + half))


def _load_preds(path):
    with open(path) as f:
        d = json.load(f)
    return {
        qa: (p, g) for qa, p, g in zip(d["qa_ids"], d["preds"], d["golds"])
    }


def report(args):
    with open(os.path.join(args.root, "labels.json")) as f:
        labels = json.load(f)
    ours_path = os.path.join(args.root, args.ours_run, "test_preds.json")
    ref_path = os.path.join(args.root, "reference", "test_preds.json")
    ours_preds = _load_preds(ours_path)
    ref_preds = _load_preds(ref_path) if os.path.exists(ref_path) else None

    def subsets(qa):
        out = ["all"]
        lab = labels.get(qa, {})
        if lab.get("novel_comp"):
            out.append("novel_comp")
        if lab.get("more_steps"):
            out.append("more_steps")
        return out

    # Extra stair-tpu variants (e.g. --ours-run ours_transformer) report
    # alongside the primary run.
    variants = []
    for d in sorted(os.listdir(args.root)):
        if d in (args.ours_run, "reference"):
            continue
        vp = os.path.join(args.root, d, "test_preds.json")
        if os.path.exists(vp):
            variants.append(("stair_tpu_" + d.removeprefix("ours_"),
                             _load_preds(vp)))

    result = {"n_test": len(ours_preds), "models": {}}
    for name, preds in [("stair_tpu", ours_preds),
                        ("reference", ref_preds)] + variants:
        if preds is None:
            continue
        accs = {}
        for split in ("all", "novel_comp", "more_steps"):
            pairs = [
                (p, g) for qa, (p, g) in preds.items() if split in subsets(qa)
            ]
            c = sum(p == g for p, g in pairs)
            acc, lo, hi = wilson(c, len(pairs))
            accs[split] = {
                "n": len(pairs), "correct": c,
                "acc": round(acc, 4),
                "ci95": [round(lo, 4), round(hi, 4)],
            }
        result["models"][name] = accs

    def paired(preds, split="all"):
        shared = [
            qa for qa in sorted(set(preds) & set(ref_preds))
            if split in subsets(qa)
        ]
        diffs = []
        for qa in shared:
            a = preds[qa][0] == preds[qa][1]
            b = ref_preds[qa][0] == ref_preds[qa][1]
            diffs.append(int(a) - int(b))
        d = np.asarray(diffs, np.float64)
        if len(d) < 2:
            return None
        mean = float(d.mean())
        se = float(d.std(ddof=1) / math.sqrt(len(d)))
        return {
            "n": len(d), "mean": round(mean, 4),
            "ci95": [round(mean - 1.96 * se, 4),
                     round(mean + 1.96 * se, 4)],
        }

    if ref_preds is not None:
        result["paired_diff"] = dict(
            paired(ours_preds),
            note="stair_tpu minus reference, per shared test question",
        )
        # Per-variant, per-split paired differences: the more_steps rows
        # are the deep-program evidence VERDICT r2 asked for.
        result["paired_diff_by_model"] = {
            name: {
                split: paired(preds, split)
                for split in ("all", "novel_comp", "more_steps")
            }
            for name, preds in [("stair_tpu", ours_preds)] + variants
        }
    out = os.path.join(args.root, "PARITY.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return result


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--func", required=True,
                    choices=["build", "ours", "reference", "reference_eval",
                             "report", "parser_loop"])
    ap.add_argument("--root", required=True)
    ap.add_argument("--num-videos", type=int, default=250)
    ap.add_argument("--questions-per-video", type=int, default=44)
    ap.add_argument("--num-frames", type=int, default=32,
                    help="frames per video; keep equal to --frames (the "
                         "reference's linear Temporal stack requires videos "
                         "at exactly max_video_length)")
    ap.add_argument("--test-size", type=int, default=1500)
    ap.add_argument("--valid-size", type=int, default=800)
    ap.add_argument("--num-workers", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--ours-epochs", type=int, default=40)
    ap.add_argument("--ref-epochs", type=int, default=6)
    ap.add_argument("--ours-run", default="ours",
                    help="run subdirectory for the stair-tpu trainer")
    ap.add_argument("--encoder", default="lstm",
                    choices=["lstm", "transformer"],
                    help="stair-tpu encoder variant for this run")
    ap.add_argument("--filter-attention", default="parity",
                    choices=["parity", "softmax"],
                    help="Filter pooling: reference parity quirk or the "
                         "corrected softmax variant")
    ap.add_argument("--contrastive-window", type=int, default=0,
                    help="stair-tpu --contrastive-window for this run "
                         "(reference accumulation-window negatives parity)")
    ap.add_argument("--rand-seed", type=int, default=1,
                    help="stair-tpu trainer seed for independent retrains")
    ap.add_argument("--parser-arch", default="lstm",
                    choices=["lstm", "transformer", "t5"],
                    help="seq2seq arch for --func parser_loop")
    ap.add_argument("--parser-epochs", type=int, default=15)
    args = ap.parse_args(argv)
    if args.func == "build":
        build(args)
    elif args.func == "ours":
        ours(args)
    elif args.func == "reference":
        reference(args)
        reference_eval(args)
    elif args.func == "reference_eval":
        reference_eval(args)
    elif args.func == "parser_loop":
        parser_loop(args)
    else:
        report(args)


if __name__ == "__main__":
    main()
