"""Data-layer tests: COLMAP parsers (round-trip against written files),
split/phase parsing, frame stacking, synthetic video generator."""
import os
import struct

import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.data import (
    make_synthetic_video,
    read_phase_index,
    read_split_file,
    split_viewpoints_by_phase,
    stack_cameras,
)
from egogaussian_tpu.data.colmap import (
    qvec2rotmat,
    read_cameras_binary,
    read_cameras_text,
    read_images_binary,
    read_points3d_binary,
    write_points3d_ply,
    read_points_ply,
)
from egogaussian_tpu.data.readers import (
    binarize_mask,
    compute_resolution,
    dilate_mask,
    frame_number,
)


def write_fake_colmap_bin(tmp_path, names=("000001.jpg", "000002.jpg")):
    """Create a minimal binary COLMAP model."""
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    # cameras.bin: one PINHOLE camera
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))  # id=1 PINHOLE 64x48
        f.write(struct.pack("<dddd", 60.0, 60.0, 32.0, 24.0))
    # images.bin
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", len(names)))
        for i, name in enumerate(names):
            f.write(struct.pack("<idddddddi", i + 1, 1.0, 0, 0, 0, 0.1 * i, 0, 2.0, 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 2))  # 2 2D points
            for p in range(2):
                f.write(struct.pack("<ddq", 1.0 * p, 2.0 * p, p))
    # points3D.bin
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 3))
        for i in range(3):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", i * 1.0, i * 2.0, i * 3.0))
            f.write(struct.pack("<BBB", 255, 128, 0))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 2))  # track of len 2
            f.write(struct.pack("<ii", 1, 0) * 2)
    return sparse


class TestColmapParsers:
    def test_cameras_binary(self, tmp_path):
        sparse = write_fake_colmap_bin(tmp_path)
        cams = read_cameras_binary(str(sparse / "cameras.bin"))
        assert cams[1].model == "PINHOLE"
        assert cams[1].width == 64 and cams[1].height == 48
        np.testing.assert_allclose(cams[1].params, [60, 60, 32, 24])

    def test_images_binary_with_filter(self, tmp_path):
        sparse = write_fake_colmap_bin(tmp_path)
        ims = read_images_binary(str(sparse / "images.bin"))
        assert len(ims) == 2
        assert ims[1].name == "000001.jpg"
        np.testing.assert_allclose(ims[2].tvec, [0.1, 0, 2.0])
        # name filter skips others (reference colmap_loader.py:208-215)
        ims_f = read_images_binary(str(sparse / "images.bin"), ["000002.jpg"])
        assert len(ims_f) == 1

    def test_points3d_binary(self, tmp_path):
        sparse = write_fake_colmap_bin(tmp_path)
        xyz, rgb, err = read_points3d_binary(str(sparse / "points3D.bin"))
        assert xyz.shape == (3, 3)
        np.testing.assert_allclose(xyz[2], [2, 4, 6])
        np.testing.assert_allclose(rgb[0], [1.0, 128 / 255, 0.0], atol=1e-6)

    def test_cameras_text(self, tmp_path):
        p = tmp_path / "cameras.txt"
        p.write_text("# comment\n1 SIMPLE_PINHOLE 100 80 50.0 50.0 40.0\n")
        cams = read_cameras_text(str(p))
        assert cams[1].model == "SIMPLE_PINHOLE"
        np.testing.assert_allclose(cams[1].params, [50, 50, 40])

    def test_qvec2rotmat_identity(self):
        np.testing.assert_allclose(qvec2rotmat(np.array([1.0, 0, 0, 0])), np.eye(3))

    def test_points_ply_roundtrip(self, tmp_path):
        xyz = np.random.RandomState(0).randn(10, 3).astype(np.float32)
        rgb = np.random.RandomState(1).rand(10, 3).astype(np.float32)
        path = str(tmp_path / "pts.ply")
        write_points3d_ply(path, xyz, rgb)
        xyz2, rgb2 = read_points_ply(path)
        np.testing.assert_allclose(xyz2, xyz, atol=1e-6)
        np.testing.assert_allclose(rgb2, rgb, atol=1e-2)


class TestSplits:
    def test_split_and_phase_files(self, tmp_path):
        sp = tmp_path / "split"
        sp.mkdir()
        (sp / "training_frames.txt").write_text("000001\n000002\n000005\n")
        (sp / "phase_frame_index.txt").write_text("1,3\n4,6\n7,9\n")
        frames = read_split_file(str(sp / "training_frames.txt"))
        assert frames == ["000001", "000002", "000005"]
        static, dynamic = read_phase_index(str(sp / "phase_frame_index.txt"))
        assert static == [(1, 3), (7, 9)]
        assert dynamic == [(4, 6)]

    def test_frame_number(self):
        assert frame_number("000123") == 123
        assert frame_number("frame_0000000042") == 42
        assert frame_number("frame_0000000042.jpg") == 42

    def test_split_viewpoints(self):
        vid = make_synthetic_video(frames_static=3, frames_dynamic=2,
                                   n_bg=20, n_obj=10, width=16, height=12)
        groups = split_viewpoints_by_phase(vid.cameras, vid.static_phases)
        assert groups[0] == [0, 1, 2]
        assert groups[1] == [5, 6, 7]
        dyn = split_viewpoints_by_phase(vid.cameras, vid.dynamic_phases)
        assert dyn[0] == [3, 4]
        # whitelist filter
        groups_f = split_viewpoints_by_phase(
            vid.cameras, vid.static_phases, ["000000", "000002"]
        )
        assert groups_f[0] == [0, 2]

    def test_phase_membership_mask_covers_heldout_endpoints(self):
        # A held-out FIRST/LAST frame of a dynamic phase is absent from the
        # training-filtered group, but stage-4 interpolation must still fill
        # it (reference interpolate_pose.py:92-99 walks the full phase
        # range) — the old group-index-span mask missed exactly this case.
        from egogaussian_tpu.data.readers import phase_membership_mask

        import types
        cams = [types.SimpleNamespace(image_name=f"{i:06d}") for i in range(10)]
        phases = [(3, 6)]
        mask = phase_membership_mask(cams, phases)
        assert list(np.nonzero(mask)[0]) == [3, 4, 5, 6]
        # group filtered by a whitelist that holds out the phase's first
        # frame: the span of the group would start at 4 — membership must not
        train = [f"{i:06d}" for i in range(10) if i != 3]
        grp = split_viewpoints_by_phase(cams, phases, train)
        assert grp[0] == [4, 5, 6]  # the defective span would be [4..6]
        assert mask[3]  # the fixed mask includes the held-out endpoint
        # an empty group (whole phase held out) is simply absent from the
        # mask path — no ValueError (ADVICE r4 low #2)
        grp_empty = split_viewpoints_by_phase(cams, [(20, 22)], train)
        assert grp_empty[0] == []
        mask2 = phase_membership_mask(cams, [(20, 22)])
        assert not mask2.any()


class TestHelpers:
    def test_compute_resolution(self):
        assert compute_resolution(3200, 2400, -1) == (1600, 1200)  # 1.6K cap
        assert compute_resolution(800, 600, -1) == (800, 600)
        assert compute_resolution(800, 600, 2) == (400, 300)
        assert compute_resolution(800, 600, 400) == (400, 300)

    def test_binarize_mask(self):
        m3 = np.stack([np.ones((4, 4)), np.zeros((4, 4)), np.zeros((4, 4))])
        out = binarize_mask(m3.astype(np.float32))
        assert out.shape == (1, 4, 4)
        assert set(np.unique(out)) <= {0.0, 1.0}
        assert out.sum() == 16

    def test_dilate_mask(self):
        m = np.zeros((1, 9, 9), np.float32)
        m[0, 4, 4] = 1.0
        out = dilate_mask(m, iterations=2)
        assert out.sum() == 25  # 5x5 block
        assert out[0, 4, 4] == 1.0


class TestSynthetic:
    def test_multi_cycle_phases(self):
        # n_cycles=2: three static phases bracketing two dynamic phases
        # (the reference's alternating phase_frame_index structure,
        # train.py:60-65); odd cycles apply the inverse step so the two
        # dynamic phases carry genuinely different motion.
        vid = make_synthetic_video(frames_static=2, frames_dynamic=2,
                                   n_bg=40, n_obj=15, width=32, height=24,
                                   n_cycles=2)
        assert len(vid.cameras) == 2 * 3 + 2 * 2
        assert vid.static_phases == [(0, 1), (4, 5), (8, 9)]
        assert vid.dynamic_phases == [(2, 3), (6, 7)]
        # object moves in BOTH dynamic phases
        for ph in vid.dynamic_phases:
            for f in range(ph[0], ph[1] + 1):
                assert np.abs(vid.gt_obj_deltas[f] - np.eye(4)).max() > 1e-3
        # cycle 1 is the inverse of cycle 0: the accumulated pose over the
        # whole video returns to identity
        accum = np.eye(4, dtype=np.float32)
        for f in range(len(vid.cameras)):
            accum = vid.gt_obj_deltas[f] @ accum
        np.testing.assert_allclose(accum, np.eye(4), atol=1e-5)
        # default n_cycles=1 is unchanged
        vid1 = make_synthetic_video(frames_static=3, frames_dynamic=2,
                                    n_bg=40, n_obj=15, width=32, height=24)
        assert vid1.static_phases == [(0, 2), (5, 7)]
        assert vid1.dynamic_phases == [(3, 4)]

    def test_multi_cycle_export_roundtrip(self, tmp_path):
        # phase_frame_index.txt interleaves static,dynamic,... for ALL
        # cycles and read_phase_index round-trips it (reference
        # train.py:60-65 consumes exactly this layout)
        from egogaussian_tpu.data.export_colmap import export_colmap_dataset
        from egogaussian_tpu.data.readers import read_phase_index

        vid = make_synthetic_video(frames_static=2, frames_dynamic=2,
                                   n_bg=30, n_obj=10, width=32, height=24,
                                   n_cycles=2)
        export_colmap_dataset(vid, str(tmp_path))
        st, dy = read_phase_index(
            str(tmp_path / "split" / "phase_frame_index.txt"))
        assert st == vid.static_phases
        assert dy == vid.dynamic_phases

    def test_video_structure(self):
        vid = make_synthetic_video(frames_static=3, frames_dynamic=2,
                                   n_bg=40, n_obj=15, width=32, height=24)
        assert len(vid.cameras) == 8
        c = vid.cameras[0]
        assert c.gt_image.shape == (3, 24, 32)
        assert c.hand_mask.shape == (1, 24, 32)
        # object visible in some masks
        assert sum(float(jnp.sum(c.obj_mask)) for c in vid.cameras) > 0
        # dynamic frames have identity deltas outside the phase
        np.testing.assert_allclose(vid.gt_obj_deltas[0], np.eye(4))
        assert not np.allclose(vid.gt_obj_deltas[3], np.eye(4))

    def test_export_split_interior_holdouts(self, tmp_path):
        # Reference-protocol split: interior eval frames, EXCLUDED from
        # training (ref train.py:54-73 trains only training_frames). Guards
        # against the two r4 defects: static_eval at the trajectory end
        # (extrapolation-capped PSNR) and dynamic_eval scoring a trained view.
        from egogaussian_tpu.data.export_colmap import export_colmap_dataset

        vid = make_synthetic_video(frames_static=4, frames_dynamic=3,
                                   n_bg=40, n_obj=15, width=32, height=24)
        export_colmap_dataset(vid, str(tmp_path))
        rd = lambda n: (tmp_path / "split" / n).read_text().split()
        train = rd("training_frames.txt")
        dyn = rd("dynamic_eval_frames.txt")
        stat = rd("static_eval_frames.txt")
        names = vid.image_names
        d0, d1 = vid.dynamic_phases[0]
        s0, s1 = vid.static_phases[-1]
        # interior: strictly inside their phases (not first/last video frame)
        assert dyn == [names[d0 + (d1 - d0) // 2]]
        assert stat == [names[s0 + (s1 - s0) // 2]]
        assert stat[0] != names[-1]
        # excluded from training; everything else present
        assert dyn[0] not in train and stat[0] not in train
        assert set(train) | set(dyn) | set(stat) == set(names)

    def test_export_split_tiny_video_legacy(self, tmp_path):
        # d<3 / short final static phase: legacy split byte-for-byte (a
        # held-out dynamic frame needs solved neighbors on both sides).
        from egogaussian_tpu.data.export_colmap import export_colmap_dataset

        vid = make_synthetic_video(frames_static=2, frames_dynamic=2,
                                   n_bg=30, n_obj=10, width=32, height=24)
        export_colmap_dataset(vid, str(tmp_path))
        rd = lambda n: (tmp_path / "split" / n).read_text().split()
        names = vid.image_names
        assert rd("training_frames.txt") == names[:-1]
        assert rd("dynamic_eval_frames.txt") == [names[vid.dynamic_phases[0][0]]]
        assert rd("static_eval_frames.txt") == [names[-1]]

    def test_object_moves_in_dynamic_phase(self):
        vid = make_synthetic_video(frames_static=3, frames_dynamic=2,
                                   n_bg=40, n_obj=15, width=32, height=24)
        # images differ between the two static phases (object moved)
        img_before = np.asarray(vid.cameras[2].gt_image)
        img_after = np.asarray(vid.cameras[6].gt_image)
        assert np.abs(img_before - img_after).max() > 0.1

    def test_stack_cameras(self):
        vid = make_synthetic_video(frames_static=2, frames_dynamic=1,
                                   n_bg=30, n_obj=10, width=32, height=24)
        batch = stack_cameras(vid.cameras)
        assert batch.num_frames == 5
        assert batch.images.shape == (5, 3, 24, 32)
        cam, img, hand, obj = batch.frame(jnp.int32(2))
        np.testing.assert_allclose(
            np.asarray(img), np.asarray(vid.cameras[2].gt_image)
        )
        np.testing.assert_allclose(
            np.asarray(cam.viewmat), np.asarray(vid.cameras[2].viewmat)
        )


class TestUint8FrameStorage:
    def test_8bit_exact_input_stored_uint8_and_decodes_exactly(self):
        """PNG-like input (k/255 pixels, binary masks) is stored uint8 on
        device (4x HBM at the reference operating point) and frame()
        decodes bit-exactly to what the loader produced."""
        import jax.numpy as jnp

        from egogaussian_tpu.data.readers import stack_cameras
        from egogaussian_tpu.render.camera import Camera, look_at

        rng = np.random.RandomState(0)
        R, t = look_at(np.array([0.0, 0.0, -4.0]), np.zeros(3))
        cams = []
        for i in range(3):
            img = (rng.randint(0, 256, (3, 12, 16)).astype(np.float32)
                   / 255.0)
            hand = (rng.rand(1, 12, 16) > 0.7).astype(np.float32)
            obj = (rng.rand(1, 12, 16) > 0.5).astype(np.float32)
            cams.append(Camera.from_colmap(
                R, t, 20.0, 20.0, 16, 12, gt_image=img, hand_mask=hand,
                obj_mask=obj, image_name=f"f{i}"))
        batch = stack_cameras(cams)
        assert batch.images.dtype == jnp.uint8
        assert batch.hand_masks.dtype == jnp.uint8
        assert batch.obj_masks.dtype == jnp.uint8
        _, img, hand, obj = batch.frame(1)
        np.testing.assert_array_equal(np.asarray(img),
                                      np.asarray(cams[1].gt_image))
        np.testing.assert_array_equal(np.asarray(hand),
                                      np.asarray(cams[1].hand_mask))
        np.testing.assert_array_equal(np.asarray(obj),
                                      np.asarray(cams[1].obj_mask))

    def test_float_input_keeps_f32(self):
        """Synthetic float images (not 8-bit exact) must stay f32."""
        import jax.numpy as jnp

        from egogaussian_tpu.data.readers import stack_cameras
        from egogaussian_tpu.data.synthetic import make_synthetic_video

        vid = make_synthetic_video(width=32, height=24, n_bg=50, n_obj=10,
                                   frames_static=2, frames_dynamic=1)
        batch = stack_cameras(vid.cameras[:2])
        assert batch.images.dtype == jnp.float32
        _, img, _, _ = batch.frame(0)
        np.testing.assert_array_equal(np.asarray(img),
                                      np.asarray(vid.cameras[0].gt_image))


class TestReferenceLayoutRehearsal:
    """Real-data ingestion rehearsal (VERDICT r2 item 7): a reference-layout
    dataset on disk exercising the quirks the reference tolerates —
    text-format COLMAP, EPIC-KITCHENS `frame_` names, jpg ground truth with
    png/jpg masks, a 3-channel mask, images/ filtering of
    registered-but-not-extracted frames (scene/dataset_readers.py:213-226),
    empty observation lines, and missing obj-mask files."""

    def _build(self, tmp_path, w=64, h=48):
        from PIL import Image

        ds = tmp_path / "ds"
        sparse = ds / "sparse" / "0"
        sparse.mkdir(parents=True)
        (ds / "images").mkdir()
        (ds / "hand_masks").mkdir()
        (ds / "obj_masks").mkdir()

        (sparse / "cameras.txt").write_text(
            "# Camera list with one line of data per camera\n"
            f"1 PINHOLE {w} {h} {0.9 * w} {0.9 * w} {w / 2} {h / 2}\n"
        )
        # 5 registered frames; frame 5 is NOT extracted into images/.
        # Frames alternate empty/non-empty observation lines (an empty
        # points line must not shift the 2-line stride).
        lines = ["# images.txt"]
        for i in range(1, 6):
            lines.append(f"{i} 1 0 0 0 0.1 0.2 {1.0 + i} 1 frame_{i:010d}.jpg")
            lines.append("" if i % 2 else "10.5 20.5 -1 30.0 40.0 7")
        (sparse / "images.txt").write_text("\n".join(lines) + "\n")
        (sparse / "points3D.txt").write_text(
            "# points3D\n"
            "1 0.0 0.0 1.0 255 0 0 0.5 1 0\n"
            "2 1.0 -1.0 2.0 0 255 0 0.4\n"
        )

        rng = np.random.RandomState(0)
        for i in range(1, 5):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(ds / "images" / f"frame_{i:010d}.jpg")
        # hand masks: 1=3-channel PNG, 2=grayscale PNG, 3=grayscale JPG
        # (fallback), 4=PNG
        m = np.zeros((h, w), np.uint8)
        m[: h // 2] = 255
        Image.fromarray(np.stack([m, m, m], -1)).save(
            ds / "hand_masks" / "frame_0000000001.png")
        Image.fromarray(m).save(ds / "hand_masks" / "frame_0000000002.png")
        Image.fromarray(m).save(ds / "hand_masks" / "frame_0000000003.jpg")
        Image.fromarray(m).save(ds / "hand_masks" / "frame_0000000004.png")
        # obj masks only for frames 1-2 (3-4 missing -> obj_mask None)
        o = np.zeros((h, w), np.uint8)
        o[h // 4: h // 2, w // 4: w // 2] = 255
        Image.fromarray(o).save(ds / "obj_masks" / "frame_0000000001.png")
        Image.fromarray(np.stack([o, o, o], -1)).save(
            ds / "obj_masks" / "frame_0000000002.png")
        return ds, w, h

    def test_load_and_stack(self, tmp_path):
        from egogaussian_tpu.data.readers import load_colmap_scene

        ds, w, h = self._build(tmp_path)
        scene = load_colmap_scene(str(ds))
        # registered-but-not-extracted frame 5 filtered out
        assert len(scene.cameras) == 4
        # EK frame_ prefix stripped from image names
        assert scene.image_names == [f"{i:010d}" for i in range(1, 5)]
        assert scene.points.shape == (2, 3)
        np.testing.assert_allclose(scene.colors[0], [1.0, 0.0, 0.0])
        for c in scene.cameras:
            assert c.gt_image.shape == (3, h, w)
            # binary [1,H,W] hand masks from 1- and 3-channel sources
            assert c.hand_mask.shape == (1, h, w)
            hm = np.asarray(c.hand_mask)
            assert set(np.unique(hm)) <= {0.0, 1.0}
            assert hm[0, 0, 0] == 1.0 and hm[0, -1, 0] == 0.0
        assert scene.cameras[0].obj_mask is not None
        assert scene.cameras[1].obj_mask is not None
        assert scene.cameras[2].obj_mask is None
        assert scene.cameras[3].obj_mask is None
        # 3-channel obj mask binarized identically to the 1-channel one
        np.testing.assert_array_equal(
            np.asarray(scene.cameras[0].obj_mask),
            np.asarray(scene.cameras[1].obj_mask),
        )

        batch = stack_cameras(scene.cameras)
        np.testing.assert_array_equal(
            np.asarray(batch.obj_mask_valid), [True, True, False, False]
        )
        # frame() round-trips the uint8-stored planes exactly
        _, img, hand, obj = batch.frame(0)
        np.testing.assert_array_equal(
            np.asarray(img), np.asarray(scene.cameras[0].gt_image))
        np.testing.assert_array_equal(
            np.asarray(obj), np.asarray(scene.cameras[0].obj_mask))

    def test_resolution_divisor(self, tmp_path):
        from egogaussian_tpu.data.readers import load_colmap_scene

        ds, w, h = self._build(tmp_path)
        scene = load_colmap_scene(str(ds), resolution=2)
        c = scene.cameras[0]
        assert (c.width, c.height) == (w // 2, h // 2)
        assert c.gt_image.shape == (3, h // 2, w // 2)
        # intrinsics scaled with the resolution
        assert abs(float(c.fx) - 0.9 * w / 2) < 1e-4
