"""nn-base / nn-variant driver contracts + chunk/stitch semantics."""

import numpy as np
import pytest

from genomicsbench_palisade_tpu.models import bonito as B

SMALL_BLOCKS = [
    (32, 1, 9, 3, False, False),
    (48, 2, 11, 1, True, True),
    (32, 1, 15, 1, False, False),
]


def test_chunk_matches_torch_unfold():
    """chunk_signal reproduces torch.unfold chunking (basecall.py:295-305)."""
    import torch

    rng = np.random.default_rng(0)
    for n, cs, ov in [(9000, 4000, 400), (12345, 4000, 0), (3999, 4000, 100),
                      (20000, 3000, 600)]:
        raw = rng.normal(0, 1, n).astype(np.float32)
        got = B.chunk_signal(raw, cs, ov)
        t = torch.tensor(raw)
        if cs > 0 and n > cs:
            step = cs - ov
            num_chunks = n // step + 1
            tmp = torch.zeros(num_chunks * step)
            tmp[:n] = t
            want = tmp.unfold(0, cs, step).numpy()
        else:
            want = t[None, :].numpy()
        np.testing.assert_array_equal(got, want)


def test_stitch_chunked_equals_whole(small_model):
    """Chunked+stitched posteriors ~= whole-read forward in the interior."""
    model, params = small_model
    rng = np.random.default_rng(1)
    sig = rng.normal(0, 1, 2400).astype(np.float32)
    import jax.numpy as jnp

    whole = np.asarray(model.apply(params, jnp.asarray(sig[None, :, None])))[0]
    cs, ov = 1200, 240  # ov/stride/2 = 40 output frames
    chunks = B.chunk_signal(sig, cs, ov)
    lp = np.asarray(model.apply(params, jnp.asarray(chunks[:, :, None])))
    stitched = B.stitch(lp, ov // 3 // 2)
    n = min(len(stitched), len(whole))
    # conv receptive-field edges differ at chunk boundaries; interior of the
    # first chunk must agree exactly-ish
    np.testing.assert_allclose(stitched[20:300], whole[20:300], atol=1e-4)
    assert n >= len(whole) - ov


@pytest.fixture(scope="module")
def small_model():
    return B.init_model(chunk=1200, blocks=SMALL_BLOCKS)


def test_basecall_cli(tmp_path, capsys, monkeypatch):
    rng = np.random.default_rng(2)
    npz = tmp_path / "sig.npz"
    np.savez(npz, readX=rng.normal(500, 40, 6000).astype(np.float32))
    # shrink the model so the random-weights smoke run is fast
    monkeypatch.setattr(B, "DNA_R941_BLOCKS", SMALL_BLOCKS)
    from genomicsbench_palisade_tpu.cli.basecall import main

    rc = main(["random", str(npz), "--chunksize", "1200", "--overlap", "120"])
    assert rc == 0
    out = capsys.readouterr()
    assert out.out.startswith(">readX\n")
    seq = out.out.strip().split("\n")[1] if "\n" in out.out.strip() else ""
    assert set(seq) <= set("ACGT")
    assert "> completed reads: 1" in out.err
    assert "> samples per second" in out.err


def test_call_var_cli(tmp_path, capsys):
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (6, 33, 8, 4)).astype(np.float32)
    npz_in = tmp_path / "tensors.npz"
    np.savez(npz_in, X=x)
    out_fn = tmp_path / "pred.npz"
    from genomicsbench_palisade_tpu.cli.call_var import main

    rc = main(["--input_fn", str(npz_in), "--output_fn", str(out_fn)])
    assert rc == 0
    cap = capsys.readouterr()
    assert "Begin predicting..." in cap.out
    assert "Time taken:" in cap.out
    pred = np.load(out_fn)
    assert pred["gt21"].shape == (6, 21)
    assert pred["genotype"].shape == (6, 3)
    assert pred["indel_length_1"].shape == (6, 33)
    for k in pred.files:  # softmax heads sum to 1
        np.testing.assert_allclose(pred[k].sum(-1), 1.0, rtol=1e-5)


def test_call_var_cli_h5(tmp_path, capsys):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(4)
    h5 = tmp_path / "tensors.h5"
    with h5py.File(h5, "w") as f:
        f.create_dataset("batch0/X", data=rng.normal(0, 1, (2, 33, 8, 4)))
        f.create_dataset("batch1/X", data=rng.normal(0, 1, (3, 33, 8, 4)))
    out_fn = tmp_path / "pred.npz"
    from genomicsbench_palisade_tpu.cli.call_var import main

    rc = main(["--input_fn", str(h5), "--output_fn", str(out_fn)])
    assert rc == 0
    assert np.load(out_fn)["gt21"].shape == (5, 21)


def test_basecall_cli_reference_surface(tmp_path, capsys, monkeypatch):
    """run-gpu.sh form: model DIRECTORY + reads DIRECTORY + --fastq
    (basecall.py:635-643)."""
    rng = np.random.default_rng(4)
    reads_dir = tmp_path / "reads"
    reads_dir.mkdir()
    np.savez(reads_dir / "a.npz",
             r1=rng.normal(500, 40, 3000).astype(np.float32))
    np.savez(reads_dir / "b.npz",
             r2=rng.normal(500, 40, 3000).astype(np.float32))
    monkeypatch.setattr(B, "DNA_R941_BLOCKS", SMALL_BLOCKS)
    # model dir with converted torch weights
    import torch

    import jax.numpy as jnp
    model, params = B.init_model(dtype=jnp.float32)
    mdl_dir = tmp_path / "bonito_dna_r941"
    mdl_dir.mkdir()
    state = B.save_torch_state_dict(params)
    torch.save(state, mdl_dir / "weights_0.tar")
    from genomicsbench_palisade_tpu.cli.basecall import main

    rc = main([str(mdl_dir), str(reads_dir), "--device", "cuda:0",
               "--fastq", "--chunksize", "1200"])
    assert rc == 0
    out = capsys.readouterr()
    recs = out.out.strip().split("\n")
    assert recs[0] == "@r1" and recs[2] == "+"
    assert "@r2" in recs
    assert "> completed reads: 2" in out.err


def test_call_var_cli_reference_flags(tmp_path, capsys):
    """The exact run-gpu.sh argument list is accepted and .h5 output
    written (prediction.py:74-110)."""
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (4, 33, 8, 4)).astype(np.float32)
    npz_in = tmp_path / "tensors.npz"
    np.savez(npz_in, X=x)
    out_fn = tmp_path / "prediction_output.h5"
    from genomicsbench_palisade_tpu.cli.call_var import main

    rc = main(["--sampleName", "chr20", "--threads", "1", "--qual", "100",
               "--input_fn", str(npz_in), "--output_fn", str(out_fn)])
    assert rc == 0
    with h5py.File(out_fn) as f:
        assert f["gt21"].shape == (4, 21)
