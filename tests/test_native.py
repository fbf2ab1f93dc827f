"""Native host-pipeline library: decode/resize/label parsing parity with the
python paths. All tests skip when the toolchain/image libs are unavailable."""

import numpy as np
import pytest
from PIL import Image

from yogo_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.fixture()
def img_file(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (77, 103), np.uint8)
    p = tmp_path / "t.png"
    Image.fromarray(arr).save(p)
    return p, arr


def test_decode_exact_same_size(img_file):
    p, arr = img_file
    out = native.decode_image(p, (77, 103))
    assert out.shape == (1, 77, 103)
    np.testing.assert_array_equal(out[0], arr)


def test_resize_matches_pil_within_1lsb(img_file):
    p, arr = img_file
    out = native.decode_image(p, (40, 56))[0]
    pil = np.asarray(
        Image.fromarray(arr).resize((56, 40), Image.Resampling.BILINEAR)
    )
    assert np.abs(out.astype(int) - pil.astype(int)).max() <= 1


def test_decode_rgb(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (20, 30, 3), np.uint8)
    p = tmp_path / "rgb.png"
    Image.fromarray(arr).save(p)
    out = native.decode_image(p, (20, 30), channels=3)
    np.testing.assert_array_equal(out, arr.transpose(2, 0, 1))


def test_decode_batch_threaded_with_failures(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    for i in range(5):
        p = tmp_path / f"{i}.png"
        Image.fromarray(rng.integers(0, 255, (16, 24), np.uint8)).save(p)
        paths.append(p)
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image")
    paths.append(bad)
    batch, ok = native.decode_batch(paths, (16, 24), n_threads=3)
    assert batch.shape == (6, 1, 16, 24)
    assert ok.tolist() == [True] * 5 + [False]


def test_parse_labels_formats(tmp_path):
    p = tmp_path / "l.txt"
    p.write_text("0 0.5 0.5 0.1 0.1\n2,0.25,0.25,0.2,0.3\n")
    rows = native.parse_labels(p)
    np.testing.assert_allclose(
        rows, [[0, 0.5, 0.5, 0.1, 0.1], [2, 0.25, 0.25, 0.2, 0.3]], atol=1e-6
    )
    hdr = tmp_path / "hdr.txt"
    hdr.write_text("class,xc,yc,w,h\n1,0.5,0.5,0.2,0.2\n")
    rows = native.parse_labels(hdr)
    assert len(rows) == 1 and rows[0, 0] == 1
    named = tmp_path / "named.txt"
    named.write_text("ring 0.5 0.5 0.2 0.2\n")
    rows = native.parse_labels(named)
    assert rows[0, 0] == -1  # caller resolves class names
    empty = tmp_path / "empty.txt"
    empty.write_text("")
    assert len(native.parse_labels(empty)) == 0


def test_load_labels_native_matches_python(tmp_path):
    """The integrated load_labels fast path returns the same rows as the
    python parser (incl. area filter)."""
    from yogo_tpu.data.labels import load_labels

    p = tmp_path / "l.txt"
    tiny = 0.0005
    p.write_text(
        f"0 0.5 0.5 0.1 0.1\n1 0.25 0.25 {tiny} {tiny}\n2 0.75 0.75 0.2 0.2\n"
    )
    fast = load_labels(p, ["a", "b", "c"])
    import pytest

    mp = pytest.MonkeyPatch()
    try:
        mp.setenv("YOGO_TPU_NO_NATIVE", "1")  # restores any prior value
        slow = load_labels(p, ["a", "b", "c"])
    finally:
        mp.undo()
    assert len(fast) == len(slow) == 2  # tiny box filtered by both
    np.testing.assert_allclose(fast, slow, atol=1e-6)


def test_dataset_uses_native_and_matches_python(tmp_path, monkeypatch):
    """The integrated dataset path must produce IDENTICAL pixel data with
    and without the native decoder (not just matching shapes)."""
    from tests.data_fixtures import CLASSES, make_pair_dirs
    from yogo_tpu.data.dataset import ObjectDetectionDataset

    img_dir, lbl_dir = make_pair_dirs(tmp_path, "n", n_images=2)
    ds = ObjectDetectionDataset(
        img_dir, lbl_dir, Sx=8, Sy=6, classes=CLASSES, image_hw=(40, 56)
    )
    img, grid = ds[0]
    assert img.shape == (1, 40, 56) and img.dtype == np.uint8
    assert grid.shape == (6, 6, 8)

    monkeypatch.setenv("YOGO_TPU_NO_NATIVE", "1")
    img_py, grid_py = ds[0]
    # decode+antialias-resize parity is 1-LSB-tested at the unit level;
    # through the integrated path the same tolerance must hold
    assert np.abs(img.astype(np.int16) - img_py.astype(np.int16)).max() <= 1
    np.testing.assert_array_equal(grid, grid_py)


def test_parse_labels_no_silent_truncation(tmp_path):
    """Files beyond the initial 4096-row buffer are fully parsed (the C
    parser returns the total count and the wrapper retries with an
    exact-size buffer) - silent truncation would drop training labels."""
    p = tmp_path / "big.txt"
    n = 5000
    p.write_text("1 0.5 0.5 0.01 0.01\n" * n)
    rows = native.parse_labels(p)
    assert rows is not None and len(rows) == n


def test_parse_labels_rejects_malformed(tmp_path):
    """Malformed files return None so the python path raises the
    reference's errors (the old parser silently skipped/mangled rows)."""
    bad_fields = tmp_path / "six.txt"
    bad_fields.write_text("0 0.5 0.5 0.1 0.1 0.9\n")  # 6 fields
    assert native.parse_labels(bad_fields) is None

    bad_coord = tmp_path / "coord.txt"
    bad_coord.write_text("0 0.5 0.5 0.1 0.1\n0 0.5 oops 0.1 0.1\n")
    assert native.parse_labels(bad_coord) is None

    short_row = tmp_path / "short.txt"
    short_row.write_text("0 0.5 0.5 0.1 0.1\n1 0.5 0.5\n")
    assert native.parse_labels(short_row) is None

    long_line = tmp_path / "long.txt"
    long_line.write_text("0 0.5 0.5 0.1 0.1" + " " * 600 + "\n")
    assert native.parse_labels(long_line) is None


def test_image_size(tmp_path):
    from PIL import Image

    p = tmp_path / "s.png"
    Image.fromarray(np.zeros((20, 30), np.uint8)).save(p)
    assert native.image_size(p) == (20, 30)
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"nope")
    assert native.image_size(bad) is None


def test_parse_labels_rejects_fractional_class(tmp_path):
    """The class column must be integer-formed: python does int(token) and
    raises on '2.0'; the native path defers those files to python (None)
    instead of silently accepting float classes."""
    p = tmp_path / "frac.txt"
    p.write_text("2.0 0.5 0.5 0.1 0.1\n")
    assert native.parse_labels(p) is None
    q = tmp_path / "halfcls.txt"
    q.write_text("1.5 0.5 0.5 0.1 0.1\n")
    assert native.parse_labels(q) is None


def test_parse_labels_short_numeric_first_line_rejected(tmp_path):
    """A truncated all-numeric FIRST row is a malformed data row, not a
    header (real headers have non-numeric column names): defer to python,
    which raises."""
    p = tmp_path / "shortfirst.txt"
    p.write_text("0 0.5 0.5 0.1\n1 0.5 0.5 0.1 0.1\n")
    assert native.parse_labels(p) is None


def test_no_native_env_value_semantics(monkeypatch):
    """YOGO_TPU_NO_NATIVE=0 must keep the native path enabled (any other
    non-empty value disables it)."""
    monkeypatch.setenv("YOGO_TPU_NO_NATIVE", "1")
    assert native.get_lib() is None
    monkeypatch.setenv("YOGO_TPU_NO_NATIVE", "0")
    assert native.get_lib() is not None
    monkeypatch.delenv("YOGO_TPU_NO_NATIVE")
    assert native.get_lib() is not None


def test_decode_rejects_absurd_dimensions(tmp_path):
    """A crafted header declaring huge dimensions must fail cleanly (ok
    mask / None), not OOM-kill the process via a multi-GB allocation."""
    import struct
    import zlib

    # minimal PNG with an IHDR declaring 50000x50000 (2.5e9 px > cap)
    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 50000, 50000, 8, 0, 0, 0, 0)
    blob = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    p = tmp_path / "huge.png"
    p.write_bytes(blob)
    assert native.decode_image(p, (16, 16)) is None


def test_parse_labels_concurrent_threads(tmp_path):
    """Concurrent parses from worker threads (the DataLoader's pattern) must
    not interfere: strtok's process-wide static state would mix tokens
    across threads; strtok_r keeps them independent."""
    from concurrent.futures import ThreadPoolExecutor

    files = []
    for i in range(8):
        p = tmp_path / f"t{i}.txt"
        rows = [f"{j % 4} 0.{i}{j}5 0.5 0.1 0.1" for j in range(200)]
        p.write_text("\n".join(rows) + "\n")
        files.append(p)
    expected = [native.parse_labels(p) for p in files]
    with ThreadPoolExecutor(max_workers=8) as ex:
        for _ in range(20):
            got = list(ex.map(native.parse_labels, files * 4))
            for g, e in zip(got, expected * 4):
                np.testing.assert_array_equal(g, e)


def test_parse_labels_defers_on_python_divergent_lines(tmp_path):
    """Lines that the python/reference path treats differently must defer
    (-2 -> None) rather than silently parse: whitespace- or separator-only
    lines break the python csv.Sniffer, and C99 hex floats parse in strtod
    but raise in python's float()."""
    good = "0 0.5 0.5 0.1 0.1\n"
    for bad in ["  \n", ",,,,\n", "0 0x1p-1 0.5 0.1 0.1\n"]:
        p = tmp_path / "d.txt"
        p.write_text(good + bad)
        assert native.parse_labels(p) is None, repr(bad)
    # pure newline blank lines are fine in both paths -> still fast-pathed
    p = tmp_path / "ok.txt"
    p.write_text(good + "\n" + good)
    rows = native.parse_labels(p)
    assert rows is not None and len(rows) == 2
