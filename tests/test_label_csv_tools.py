"""io/label_csv_tools — the join_color_and_id.ipynb capability
(kimera_semantics_ros/cfg/join_color_and_id.ipynb): joining instance-color
rows with class ids into the `name,red,green,blue,alpha,id` CSV format that
SemanticLabel2Color consumes (color.cpp:47-56)."""

import numpy as np
import pytest

from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.io.label_csv_tools import (join_color_and_id,
                                                     write_label_csv)


def test_join_color_and_id_roundtrips_through_loader(tmp_path):
    color_rows = [
        {"name": "White", "red": 255, "green": 255, "blue": 255},
        {"name": "Wall", "red": 10, "green": 20, "blue": 30, "alpha": 255},
        {"name": "Floor", "red": 40, "green": 50, "blue": 60},
    ]
    ids = {"White": 0, "Wall": 1, "Floor": 2}
    text = join_color_and_id(color_rows, ids)
    path = tmp_path / "labels.csv"
    path.write_text(text)
    lmap = LabelColorMap.from_csv(str(path))
    # Wall color maps back to label 1; Floor to 2.
    labs = lmap.labels_from_colors(
        np.array([[[10, 20, 30], [40, 50, 60]]], dtype=np.uint8))
    assert labs.tolist() == [[1, 2]]


def test_join_missing_id_raises():
    with pytest.raises(KeyError):
        join_color_and_id([{"name": "X", "red": 1, "green": 2, "blue": 3}], {})


def test_write_label_csv_loads_back(tmp_path):
    path = str(tmp_path / "m.csv")
    write_label_csv(path, {0: (255, 255, 255), 3: (9, 8, 7)},
                    names={3: "Chair"})
    lmap = LabelColorMap.from_csv(path)
    labs = lmap.labels_from_colors(np.array([[[9, 8, 7]]], dtype=np.uint8))
    assert labs.tolist() == [[3]]
    with open(path) as f:
        assert "Chair" in f.read()


def test_from_csv_expands_label_space_past_21():
    from kimera_semantics_tpu.core.color import LabelColorMap
    # goseek_scene1 uses ids up to 255 — past the reference's compile-time 21
    rows = "name,red,green,blue,alpha,id\n" + "\n".join(
        f"c{i},{i},{255 - i},7,255,{i}" for i in (1, 20, 100, 255))
    lmap = LabelColorMap.from_csv(rows)
    assert lmap.num_labels == 256
    import numpy as np
    lab = lmap.labels_from_colors(np.array([[[100, 155, 7]]], np.uint8))
    assert int(np.asarray(lab)[0, 0]) == 100
    # explicit override still wins
    assert LabelColorMap.from_csv(rows, num_labels=300).num_labels == 300
    # small CSVs keep the reference's 21 floor
    small = "name,red,green,blue,alpha,id\nx,1,2,3,255,3\n"
    assert LabelColorMap.from_csv(small).num_labels == 21


def test_white_rows_do_not_inflate_label_space():
    from kimera_semantics_tpu.core.color import LabelColorMap
    # goseek: 'Missing,255,255,255,255,255' — White is force-mapped to label
    # 0, so id 255 must not size a 256-wide semantic channel
    rows = ("name,red,green,blue,alpha,id\n"
            "a,10,20,30,255,5\n"
            "Missing,255,255,255,255,255\n")
    assert LabelColorMap.from_csv(rows).num_labels == 21
    path = ("/root/reference/kimera_semantics_ros/cfg/"
            "goseek_scene1_segmentation_mapping.csv")
    import os
    if os.path.exists(path):
        assert LabelColorMap.from_csv(path).num_labels <= 64
