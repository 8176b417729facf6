#!/usr/bin/env python3
"""ROS data-capture helper: save synchronized RGB/depth pairs from a
RealSense camera (parity with the reference ros/collect_images_realsense.py:
22-97 — writes <n>-color.png / <n>-depth.png suitable for tools/test_images).
"""

import argparse
import os

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="Collect RGB-D pairs")
    parser.add_argument("--outdir", type=str, default="data/captured")
    parser.add_argument("--rgb", type=str,
                        default="/camera/color/image_raw")
    parser.add_argument("--depth", type=str,
                        default="/camera/aligned_depth_to_color/image_raw")
    parser.add_argument("--interval", type=float, default=1.0,
                        help="seconds between saved pairs")
    return parser.parse_args()


def main():
    args = parse_args()
    import cv2
    import message_filters
    import rospy
    from cv_bridge import CvBridge
    from sensor_msgs.msg import Image

    os.makedirs(args.outdir, exist_ok=True)
    bridge = CvBridge()
    state = {"count": 0, "last": 0.0}

    def callback(rgb_msg, depth_msg):
        now = rospy.get_time()
        if now - state["last"] < args.interval:
            return
        state["last"] = now
        im = bridge.imgmsg_to_cv2(rgb_msg, "bgr8")
        if depth_msg.encoding == "32FC1":
            # zero NaN/inf invalid pixels BEFORE the uint16 cast (float->uint
            # of NaN is undefined; 0 = invalid is what the downstream
            # z>0 validity filter expects)
            depth_f = np.nan_to_num(bridge.imgmsg_to_cv2(depth_msg),
                                    nan=0.0, posinf=0.0, neginf=0.0)
            depth = np.clip(depth_f * 1000, 0, 65535).astype(np.uint16)
        else:
            depth = bridge.imgmsg_to_cv2(depth_msg).astype(np.uint16)
        i = state["count"]
        cv2.imwrite(os.path.join(args.outdir, "%06d-color.png" % i), im)
        cv2.imwrite(os.path.join(args.outdir, "%06d-depth.png" % i), depth)
        state["count"] += 1
        rospy.loginfo(f"saved pair {i}")

    rospy.init_node("collect_images")
    rgb_sub = message_filters.Subscriber(args.rgb, Image, queue_size=2)
    depth_sub = message_filters.Subscriber(args.depth, Image, queue_size=2)
    sync = message_filters.ApproximateTimeSynchronizer(
        [rgb_sub, depth_sub], queue_size=10, slop=0.1)
    sync.registerCallback(callback)
    rospy.spin()


if __name__ == "__main__":
    main()
