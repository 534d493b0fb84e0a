import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def apollo_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("apollo"))
    os.makedirs(os.path.join(root, "images"))
    annos = []
    for i in range(4):
        img = "images/{:03d}.jpg".format(i)
        Image.new("RGB", (256, 144)).save(os.path.join(root, img))
        # two straight lanes at y=-3 and y=+3
        lanes = []
        for y0 in (-3.0, 3.0):
            pts = [[5.0 + 5 * k, y0 + 0.1 * i, 0.02 * k] for k in range(15)]
            lanes.append(pts)
        annos.append({"raw_file": img, "laneLines": lanes})
    with open(os.path.join(root, "val.jsonl"), "w") as f:
        for a in annos:
            f.write(json.dumps(a) + "\n")
    return root


def test_apollo_dataset_and_metric(apollo_root):
    from paddle3d_tpu.datasets.apollo import ApolloLaneDataset
    from paddle3d_tpu.sample import Sample
    ds = ApolloLaneDataset(dataset_root=apollo_root, anno_file="val.jsonl",
                           mode="val", image_size=(72, 128),
                           bev_size=(50, 20))
    assert len(ds) == 4
    s = ds[0]
    assert s.data.shape == (72, 128, 3)
    assert s.lane_conf.sum() > 10
    assert s.lane_instance.max() == 2
    batch, metas = ds.collate_fn([ds[0], ds[1]])
    assert batch["lane_conf"].shape == (2, 50, 20)

    # metric roundtrip: feed gt-derived grids as predictions
    metric = ds.metric
    preds = []
    for i in range(len(ds)):
        p = ds[i]
        pred = Sample(path=p.path, modality="image")
        pred.meta.id = i
        pred.lane_conf = p.lane_conf
        pred.lane_offset = p.lane_offset
        pred.lane_height = p.lane_height
        # perfectly separated embeddings per instance
        emb = np.zeros(p.lane_instance.shape + (2,), np.float32)
        emb[..., 0] = p.lane_instance * 10.0
        pred.lane_embed = emb
        preds.append(pred)
    metric.update(preds)
    res = metric.compute()
    assert res["F-score"] > 0.9
