

def test_new_image_and_point_transforms():
    import numpy as np
    from paddle3d_tpu.geometries import PointCloud
    from paddle3d_tpu.sample import Sample
    from paddle3d_tpu.transforms import (HardVoxelize,
                                         MSResizeCropFlipImage,
                                         PhotoMetricDistortionMultiViewImage,
                                         RandomBrightness, RandomContrast,
                                         RandomSaturation,
                                         RandomScaleImageMultiViewImage,
                                         ResizeShortestEdge,
                                         SamplePointByVoxels)

    rng = np.random.default_rng(0)

    # point transforms
    s = Sample(path=None, modality="lidar")
    s.data = PointCloud(rng.uniform([0, -40, -3, 0], [70, 40, 1, 1],
                                    (5000, 4)).astype(np.float32))
    s = SamplePointByVoxels(num_points=1024)(s)
    assert np.asarray(s.data).shape == (1024, 4)

    s = HardVoxelize([0., -40., -3., 70.4, 40., 1.], [0.16, 0.16, 4.],
                     max_points_in_voxel=32, max_voxel_num=2000)(s)
    assert s.voxels.shape == (2000, 32, 4)
    assert s.num_voxels > 0

    # mono image transforms
    m = Sample(path=None, modality="image")
    m.data = rng.uniform(0, 255, (100, 160, 3)).astype(np.float32)
    m.meta.camera_intrinsic = np.array([[700., 0, 80], [0, 700., 50],
                                        [0, 0, 1]], np.float32)
    m = ResizeShortestEdge(short_edge_length=50)(m)
    assert min(m.data.shape[:2]) == 50
    for t in (RandomContrast(prob=1.0), RandomBrightness(prob=1.0),
              RandomSaturation(prob=1.0)):
        m = t(m)
        assert np.asarray(m.data).min() >= 0
        assert np.asarray(m.data).max() <= 255

    # multiview transforms
    mv = Sample(path=None, modality="multiview")
    mv.img = rng.uniform(0, 255, (2, 64, 96, 3)).astype(np.float32)
    mv.meta.lidar2imgs = np.broadcast_to(
        np.eye(4, dtype=np.float32), (2, 4, 4)).copy()
    mv = PhotoMetricDistortionMultiViewImage()(mv)
    mv = RandomScaleImageMultiViewImage(scales=[0.5])(mv)
    assert mv.img.shape == (2, 32, 48, 3)
    assert abs(mv.meta.lidar2imgs[0, 0, 0] - 0.5) < 1e-6
    mv2 = Sample(path=None, modality="multiview")
    mv2.img = rng.uniform(0, 255, (2, 64, 96, 3)).astype(np.float32)
    mv2 = MSResizeCropFlipImage(resize_ranges=((0.8, 0.9), (1.0, 1.1)),
                                final_size=(32, 48))(mv2)
    assert mv2.img.shape == (2, 32, 48, 3)
