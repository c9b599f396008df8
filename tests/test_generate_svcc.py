"""SVCC23 dataset reproduction (egs/generate_dataset/generate_svcc.py)
against a synthetic NHSS-layout corpus — VERDICT round-1 missing #5."""

import importlib.util
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module():
    path = os.path.join(REPO, "egs", "generate_dataset", "generate_svcc.py")
    spec = importlib.util.spec_from_file_location("generate_svcc", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_fake_nhss(root):
    """{root}/{spk}/{Sxx}/{Song,Speech}/xx.wav (+ .lab) + Sxx/song.wav."""
    from svcc23_fastsvc_tpu.bin.common import write_wav

    sr = 48000
    rng = np.random.default_rng(0)
    for spk in ("M04", "F01", "M03", "F02", "M02", "F04"):
        for song in ("S01", "S05"):  # S05 is a held-out test song
            for style in ("Song", "Speech"):
                d = os.path.join(root, spk, song, style)
                os.makedirs(d, exist_ok=True)
                for j in range(2):
                    t = np.arange(int(0.4 * sr)) / sr
                    x = 0.2 * np.sin(2 * np.pi * 200 * t) * (t > 0.05) * (
                        t < 0.35
                    ) + 0.001 * rng.standard_normal(len(t))
                    write_wav(os.path.join(d, f"{j:02d}.wav"),
                              x.astype(np.float32), sr)
                    with open(os.path.join(d, f"{j:02d}.lab"), "w") as f:
                        f.write("0 100 <SIL>\n100 200 hello\n"
                                "200 300 world\n300 400 <SIL>\n")
            # full mix used by the test-set carving
            t = np.arange(int(30.0 * sr)) / sr
            mix = 0.2 * np.sin(2 * np.pi * 150 * t)
            write_wav(os.path.join(root, spk, song, "song.wav"),
                      mix.astype(np.float32), sr)


def test_generate_svcc_reproduction(tmp_path):
    mod = _load_module()
    nhss = tmp_path / "NHSS"
    out = tmp_path / "SVCC23"
    _make_fake_nhss(str(nhss))

    csv_path = tmp_path / "test_set.csv"
    csv_path.write_text(
        "idx,start,stop,name,index1,id,\n"
        "1,5.75,11.86,hey jude,0,F01_S05_1,6.11\n"
        "1,5.86,11.83,hey jude,0,M02_S05_1,5.97\n"
        "2,11.86,18.79,take a sad song,1,F04_S05_2,6.93\n"
    )

    argv = sys.argv
    sys.argv = ["generate_svcc.py", "--nhss-root", str(nhss),
                "--outdir", str(out), "--test-csv", str(csv_path),
                "--sr", "24000"]
    try:
        mod.main()
    finally:
        sys.argv = argv

    from svcc23_fastsvc_tpu.bin.common import read_wav

    # training: in-domain speakers contribute Song, cross-domain Speech,
    # test songs excluded -> 2 utterances each (S01 only), renumbered 1XXXX
    for svcc in ("IDM1", "IDF1", "CDM1", "CDF1"):
        files = sorted(os.listdir(out / svcc))
        assert "10001.wav" in files and "10002.wav" in files, (svcc, files)
        assert "10003.wav" not in files  # S05 dropped
        # transcripts derived from .lab without <SIL>
        assert (out / svcc / "10001.txt").read_text().strip() == "hello world"
        audio, sr = read_wav(str(out / svcc / "10001.wav"))
        assert sr == 24000  # resampled
        assert len(audio) < int(0.4 * 24000)  # silence trimmed
    # evaluation-only speakers get no training dir
    assert not (out / "SM1").exists() and not (out / "SF1").exists()

    # test carving: SM1/SF1 (M02/F04) -> evaluation, F01 -> ground_truth
    ev, sr = read_wav(str(out / "evaluation" / "SM1" / "30001.wav"))
    assert sr == 48000  # reference leaves test cuts at source rate
    assert abs(len(ev) - int((11.83 - 5.86) * 48000)) <= 1
    assert (out / "evaluation" / "SF1" / "30002.wav").exists()
    assert (out / "ground_truth" / "IDF1" / "30001.wav").exists()
