"""Exercise the ROS node's adapter logic without a ROS install.

The node (ros/test_images_segmentation.py) imports rospy/cv_bridge/
message_filters lazily inside ImageListener; stubbing those modules lets
the full subscribe -> latest-frame -> segment -> publish path run under
pytest.  This is exactly the seam that hid a real bug: the overlay topics
(seg_image / seg_image_refined) were advertised but never published
(the reference publishes both, ros/test_images_segmentation.py:163-194).
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.engine.pipeline import Segmentor
from unseenobjectclustering_tpu.engine.stream import StreamSegmentor
from unseenobjectclustering_tpu.models import get_network


class _FakePublisher:
    def __init__(self, topic, *a, **k):
        self.topic = topic
        self.published = []

    def publish(self, msg):
        self.published.append(msg)


class _FakeMsg:
    def __init__(self, data=None, encoding=None):
        self.data = data
        self.encoding = encoding
        self.header = types.SimpleNamespace(stamp=0)


class _FakeBridge:
    def imgmsg_to_cv2(self, msg, fmt=None):
        return msg.data

    def cv2_to_imgmsg(self, arr, fmt=None):
        return _FakeMsg(data=arr, encoding=fmt)


def _install_fake_ros(monkeypatch):
    cam_info = types.SimpleNamespace(K=[30.0, 0, 16.0, 0, 30.0, 16.0,
                                        0, 0, 1])
    rospy = types.ModuleType("rospy")
    rospy.Publisher = _FakePublisher
    rospy.wait_for_message = lambda topic, typ: cam_info
    rospy.logerr_throttle = lambda *a, **k: None
    rospy.loginfo_throttle = lambda *a, **k: None

    mf = types.ModuleType("message_filters")

    class _Sub:
        def __init__(self, *a, **k):
            pass

    class _Sync:
        def __init__(self, subs, queue_size, slop):
            pass

        def registerCallback(self, cb):
            _Sync.callback = cb

    mf.Subscriber = _Sub
    mf.ApproximateTimeSynchronizer = _Sync

    cvb = types.ModuleType("cv_bridge")
    cvb.CvBridge = _FakeBridge
    smsg = types.ModuleType("sensor_msgs")
    smsg_msg = types.ModuleType("sensor_msgs.msg")
    smsg_msg.Image = object
    smsg_msg.CameraInfo = object
    smsg.msg = smsg_msg

    for name, mod in [("rospy", rospy), ("message_filters", mf),
                      ("cv_bridge", cvb), ("sensor_msgs", smsg),
                      ("sensor_msgs.msg", smsg_msg)]:
        monkeypatch.setitem(sys.modules, name, mod)
    return _Sync


def test_ros_node_publishes_labels_and_overlays(monkeypatch):
    sync_cls = _install_fake_ros(monkeypatch)

    import importlib
    node = importlib.import_module("ros.test_images_segmentation")

    cfg = Config.from_dict({
        "INPUT": "RGBD",
        "TRAIN": {"NUM_UNITS": 4, "SYN_CROP_SIZE": 32},
        "CLUSTER": {"NUM_SEEDS": 8, "MAX_INSTANCES": 4,
                    "USE_PALLAS": False},
    })
    model = get_network("seg_resnet34_8s_embedding", cfg, num_units=4)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, train=False)
    seg = Segmentor(cfg, variables, variables_crop=variables,
                    depth_threshold=None)
    stream = StreamSegmentor(cfg, seg)

    # crop net present -> node publishes the refined topics too
    args = types.SimpleNamespace(camera="D415", pretrained_crop="crop.ckpt")
    listener = node.ImageListener(args, cfg, stream)

    # idle tick: nothing pending -> False (main loop sleeps on this)
    assert listener.run_network() is False

    rng = np.random.RandomState(0)
    rgb_msg = _FakeMsg(rng.randint(0, 255, (32, 32, 3), np.uint8))
    depth_msg = _FakeMsg((1000 + 500 * rng.rand(32, 32)).astype(np.uint16),
                         encoding="16UC1")
    sync_cls.callback(rgb_msg, depth_msg)
    assert listener.run_network() is True

    assert len(listener.label_pub.published) == 1
    lab = listener.label_pub.published[0]
    assert lab.encoding == "mono8" and lab.data.shape == (32, 32)
    # downstream TF/time sync needs the input frame's header on every
    # published message
    assert lab.header is rgb_msg.header
    # the overlay topic must actually carry frames (regression: it was
    # advertised but never published)
    assert len(listener.image_pub.published) == 1
    overlay = listener.image_pub.published[0]
    assert overlay.encoding == "bgr8" and overlay.data.shape == (32, 32, 3)
    assert overlay.header is rgb_msg.header
    # refined label + overlay both publish when a crop net is loaded
    assert len(listener.label_refined_pub.published) == 1
    assert listener.label_refined_pub.published[0].data.shape == (32, 32)
    assert len(listener.image_refined_pub.published) == 1
    ref_overlay = listener.image_refined_pub.published[0]
    assert ref_overlay.encoding == "bgr8"
    assert ref_overlay.header is rgb_msg.header

    # 32FC1 depth (already meters) is accepted as-is
    depth_f = _FakeMsg((1.0 + 0.5 * rng.rand(32, 32)).astype(np.float32),
                       encoding="32FC1")
    sync_cls.callback(rgb_msg, depth_f)
    assert listener.run_network() is True
    assert len(listener.label_pub.published) == 2

    # unsupported depth encoding is rejected without crashing
    bad = _FakeMsg(np.zeros((32, 32)), encoding="8UC1")
    sync_cls.callback(rgb_msg, bad)
    assert listener.run_network() is False
