"""Base model classes.

Re-design of the reference's forward-mode dispatch
(reference: paddle3d/models/base/base_model.py:42,66-72): instead of mutating
an `in_export_mode` flag on sublayers, the three entry points are plain
methods on an nnx.Module; the Trainer jits `train_forward` and the eval /
export paths jit `test_forward` / `export_forward` as separate pure
functions via nnx.split.
"""
import abc

from flax import nnx


class Base3DModel(nnx.Module, abc.ABC):
    """Base for all 3D perception models.

    Contract (all fixed shapes, batch dicts of jnp arrays):
      train_forward(batch) -> dict of scalar losses (key 'loss' = total)
      test_forward(batch)  -> dict of fixed-shape prediction arrays
                              ('box3d_lidar' [B,K,7], 'scores' [B,K] with -1
                              padding, 'label_preds' [B,K] with -1 padding)
      export_forward(batch)-> single-sample variant of test_forward used by
                              the AOT export path.
    Host-side conversion of predictions to Sample records lives in
    `postprocess_to_samples` so the device program stays fixed-shape
    (SURVEY.md §7 hard part 6).
    """

    @property
    def sync_bn(self) -> bool:
        """Whether BN stats should be averaged across data-parallel devices."""
        return getattr(self, "_sync_bn", False)

    @abc.abstractmethod
    def train_forward(self, batch) -> dict:
        ...

    @abc.abstractmethod
    def test_forward(self, batch) -> dict:
        ...

    def export_forward(self, batch) -> dict:
        return self.test_forward(batch)

    def export_input_spec(self):
        """Optional dict of example input arrays (name -> np.ndarray) for
        AOT export (reference: base_model.py:122-132 + per-family input
        specs, base_lidar_detection.py). None = tools/export.py derives the
        spec from the first collated val-dataset batch, which is correct for
        every modality by construction."""
        return None

    def __call__(self, batch):
        return self.train_forward(batch)


class BaseLidarModel(Base3DModel):
    """LiDAR family marker (reference: base_lidar_detection.py:24)."""
    modality = "lidar"


class BaseMonoModel(Base3DModel):
    """Monocular-camera family marker (reference: base_mono_detection.py)."""
    modality = "image"


class BaseMultiViewModel(Base3DModel):
    """Multi-view family marker (reference: base_multiview_detection.py)."""
    modality = "multiview"
