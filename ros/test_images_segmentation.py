#!/usr/bin/env python3
"""ROS node: live RGB-D unseen-object segmentation on TPU.

Parity with the reference node (ros/test_images_segmentation.py:47-285):
subscribes to synchronized RGB + aligned-depth topics (RealSense D415,
Azure Kinect, or Kinect Fusion layouts), reads intrinsics from CameraInfo,
and publishes `seg_label` / `seg_label_refined` (mono8) plus color-overlay
images.  The compute core is engine.stream.StreamSegmentor — this file is
only the rospy transport adapter, so it imports ROS lazily and the engine is
fully testable without a ROS install.

Run (ROS environment required):
  rosrun unseenobjectclustering_tpu test_images_segmentation.py \
      --network seg_resnet34_8s_embedding --pretrained ckpt.pth \
      --pretrained_crop ckpt_crop.pth --camera D415
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAMERA_TOPICS = {
    # camera name -> (rgb topic, depth topic, camera_info topic)
    # (ros/test_images_segmentation.py:68-98)
    "D415": ("/camera/color/image_raw",
             "/camera/aligned_depth_to_color/image_raw",
             "/camera/color/camera_info"),
    "Azure": ("/k4a/rgb/image_raw",
              "/k4a/depth_to_rgb/image_raw",
              "/k4a/rgb/camera_info"),
    "Fetch": ("/head_camera/rgb/image_raw",
              "/head_camera/depth_registered/image_raw",
              "/head_camera/rgb/camera_info"),
}


def parse_args():
    parser = argparse.ArgumentParser(description="ROS segmentation node (TPU)")
    parser.add_argument("--pretrained", type=str, default=None)
    parser.add_argument("--pretrained_crop", type=str, default=None)
    parser.add_argument("--cfg", dest="cfg_file", type=str, default=None)
    parser.add_argument("--network", dest="network_name", type=str,
                        default="seg_resnet34_8s_embedding")
    parser.add_argument("--camera", type=str, default="D415",
                        choices=sorted(CAMERA_TOPICS))
    parser.add_argument("--fast", action="store_true")
    return parser.parse_args()


class ImageListener:
    """Subscribes RGB+depth, keeps the newest frame, publishes results."""

    def __init__(self, args, cfg, stream):
        import rospy
        import message_filters
        from cv_bridge import CvBridge
        from sensor_msgs.msg import CameraInfo, Image

        self.rospy = rospy
        self.bridge = CvBridge()
        self.stream = stream
        self.refine = args.pretrained_crop is not None

        rgb_topic, depth_topic, info_topic = CAMERA_TOPICS[args.camera]
        info = rospy.wait_for_message(info_topic, CameraInfo)
        k = np.array(info.K).reshape(3, 3)
        self.intrinsics = (k[0, 0], k[1, 1], k[0, 2], k[1, 2])

        self.label_pub = rospy.Publisher("seg_label", Image, queue_size=10)
        self.label_refined_pub = rospy.Publisher("seg_label_refined", Image,
                                                 queue_size=10)
        self.image_pub = rospy.Publisher("seg_image", Image, queue_size=10)
        self.image_refined_pub = rospy.Publisher("seg_image_refined", Image,
                                                 queue_size=10)

        rgb_sub = message_filters.Subscriber(rgb_topic, Image, queue_size=10)
        depth_sub = message_filters.Subscriber(depth_topic, Image,
                                               queue_size=10)
        sync = message_filters.ApproximateTimeSynchronizer(
            [rgb_sub, depth_sub], queue_size=10, slop=0.1)
        sync.registerCallback(self.callback_rgbd)

    def callback_rgbd(self, rgb_msg, depth_msg):
        im = self.bridge.imgmsg_to_cv2(rgb_msg, "bgr8")
        if depth_msg.encoding == "32FC1":
            depth = self.bridge.imgmsg_to_cv2(depth_msg)
        elif depth_msg.encoding == "16UC1":
            depth = self.bridge.imgmsg_to_cv2(depth_msg).astype(
                np.float32) / 1000.0
        else:
            self.rospy.logerr_throttle(
                1, f"unsupported depth encoding {depth_msg.encoding}")
            return
        self.stream.submit(im, depth, self.intrinsics, rgb_msg.header)

    def run_network(self):
        """Process the newest frame, publish labels AND color overlays
        (reference publishes both, ros/test_images_segmentation.py:163-194).
        Returns True when a frame was processed (False = idle)."""
        from unseenobjectclustering_tpu.utils.masks import (
            visualize_segmentation)

        result = self.stream.process_latest(refine=self.refine)
        if result is None:
            return False
        header = result.stamp
        label_msg = self.bridge.cv2_to_imgmsg(
            result.labels.astype(np.uint8), "mono8")
        label_msg.header = header
        self.label_pub.publish(label_msg)
        # overlay keeps the input (BGR) color space
        overlay = visualize_segmentation(result.bgr, result.labels)
        overlay_msg = self.bridge.cv2_to_imgmsg(overlay, "bgr8")
        overlay_msg.header = header
        self.image_pub.publish(overlay_msg)
        if result.labels_refined is not None:
            msg = self.bridge.cv2_to_imgmsg(
                result.labels_refined.astype(np.uint8), "mono8")
            msg.header = header
            self.label_refined_pub.publish(msg)
            overlay_r = visualize_segmentation(result.bgr,
                                               result.labels_refined)
            msg_r = self.bridge.cv2_to_imgmsg(overlay_r, "bgr8")
            msg_r.header = header
            self.image_refined_pub.publish(msg_r)
        self.rospy.loginfo_throttle(
            5, f"segmentation latency {result.latency_s:.3f}s")
        return True


def main():
    args = parse_args()
    import rospy

    from unseenobjectclustering_tpu.config import FAST_CLUSTER, Config
    from unseenobjectclustering_tpu.engine.builder import build_segmentor
    from unseenobjectclustering_tpu.engine.stream import StreamSegmentor

    cfg = (Config.from_yaml(args.cfg_file) if args.cfg_file
           else Config.inference_default())  # shipped-recipe defaults
    cfg = cfg.replace(MODE="TEST")
    if args.fast:
        cfg = cfg.replace(CLUSTER=dict(FAST_CLUSTER))

    import jax.numpy as jnp
    segmentor = build_segmentor(
        cfg, args.network_name, pretrained=args.pretrained,
        pretrained_crop=args.pretrained_crop, depth_threshold=0.8,
        model_dtype=jnp.bfloat16 if args.fast else None)
    stream = StreamSegmentor(cfg, segmentor)

    rospy.init_node("seg_rgb")
    listener = ImageListener(args, cfg, stream)
    import time
    while not rospy.is_shutdown():
        # sleep on idle ticks: a tight no-frame spin would hold the GIL and
        # starve the rospy subscriber threads feeding the frame buffer
        if not listener.run_network():
            time.sleep(0.001)


if __name__ == "__main__":
    main()
