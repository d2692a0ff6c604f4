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
