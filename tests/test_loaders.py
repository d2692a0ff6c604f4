"""Source loaders: sequential files/videos + threaded streams."""

import numpy as np
import pytest

from yolo_tpu.data.loaders import LoadImagesAndVideos, LoadStreams, load_inference_source


@pytest.fixture()
def media_dir(tmp_path):
    import cv2

    d = tmp_path
    for i in range(3):
        cv2.imwrite(str(d / f"im{i}.png"), np.full((32, 48, 3), 10 * i, np.uint8))
    vw = cv2.VideoWriter(str(d / "v.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 32))
    for f in range(6):
        vw.write(np.full((32, 48, 3), f, np.uint8))
    vw.release()
    return d


def test_load_images_and_videos(media_dir):
    loader = LoadImagesAndVideos(media_dir)
    items = list(loader)
    # 3 images + 6 video frames
    assert len(items) == 9
    paths = {p for p, _, _ in items}
    assert any("v.mp4" in p for p in paths)


def test_vid_stride(media_dir):
    loader = LoadImagesAndVideos(media_dir / "v.mp4", vid_stride=2)
    assert len(list(loader)) == 3


def test_load_streams_over_file(media_dir):
    streams = LoadStreams([str(media_dir / "v.mp4")], buffer=True)
    got = 0
    try:
        for _, images, _ in streams:
            assert images[0].shape == (32, 48, 3)
            got += 1
            if got >= 4:
                break
    finally:
        streams.close()
    assert got >= 4


def test_route_inference_source(media_dir):
    assert isinstance(load_inference_source(media_dir), LoadImagesAndVideos)


def test_predictor_routes_tensor_and_stream_sources():
    """_iter_source routes 4-D arrays through LoadTensor and plumbs
    stream_buffer into stream loaders (ref: predictor source routing)."""
    from yolo_tpu.engine.predictor import _iter_source

    batch = np.random.default_rng(0).integers(0, 255, (3, 32, 40, 3), np.uint8)
    items = list(_iter_source(batch))
    assert len(items) == 3
    frame, path, idx = items[0]
    assert frame.shape == (32, 40, 3) and path.startswith("image")


def test_stream_buffer_keeps_all_frames(tmp_path):
    """LoadStreams buffer=True retains every frame (stream_buffer semantics,
    ref data/loaders.py LoadStreams:54)."""
    import cv2

    from yolo_tpu.data.loaders import LoadStreams

    vid = tmp_path / "s.mp4"
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30, (32, 32))
    n = 25
    for i in range(n):
        f = np.full((32, 32, 3), i * 10 % 255, np.uint8)
        vw.write(f)
    vw.release()

    # buffered: every frame comes through in order
    ls = LoadStreams(str(vid), buffer=True)
    got = []
    try:
        for _, frames, _ in ls:
            got.append(int(frames[0][0, 0, 0]))
            if len(got) >= n - 2:
                break
    except StopIteration:
        pass
    ls.close()
    diffs = np.diff([g // 10 for g in got])
    assert (diffs >= 0).all(), got  # in-order, no rewinds
    assert len(got) >= n // 2  # buffered mode keeps (at least most of) the frames


def test_screen_prefix_is_not_hijacked(tmp_path):
    """Paths merely starting with 'screen' are files, not screen captures."""
    import cv2
    import numpy as np

    from yolo_tpu.data.loaders import LoadImagesAndVideos, load_inference_source

    d = tmp_path / "screenshots"
    d.mkdir()
    cv2.imwrite(str(d / "img.png"), np.zeros((8, 8, 3), np.uint8))
    loader = load_inference_source(str(d / "img.png"))
    assert isinstance(loader, LoadImagesAndVideos)
    items = list(loader)
    assert len(items) == 1 and items[0][1].shape == (8, 8, 3)


def test_missing_source_raises(tmp_path):
    import pytest

    from yolo_tpu.data.loaders import load_inference_source

    with pytest.raises(FileNotFoundError):
        load_inference_source(str(tmp_path / "nope.png"))


def test_jax_tensor_batch_routes_to_loadtensor():
    import jax.numpy as jnp

    from yolo_tpu.data.loaders import LoadTensor, load_inference_source

    x = jnp.zeros((2, 8, 8, 3), jnp.uint8)
    loader = load_inference_source(x)
    assert isinstance(loader, LoadTensor)
    assert len(list(loader)) == 2
