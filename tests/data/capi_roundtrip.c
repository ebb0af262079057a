/* Standalone C round trip through the XRSLAM C ABI (native/XRSLAM.h):
 * create from a YAML pair, push IMU + one camera frame, run one frame,
 * read every result type, destroy. Compiled and executed by
 * tests/test_native.py::test_capi_c_roundtrip; prints parseable
 * CAPI_* lines. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "XRSLAM.h"

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s slam.yaml device.yaml\n", argv[0]);
        return 2;
    }
    void *cfg = NULL;
    if (XRSLAMCreate(argv[1], argv[2], NULL, NULL, &cfg) != 1) {
        fprintf(stderr, "create failed: %s\n", XRSLAMGetLastError());
        return 1;
    }

    XRSLAMStringOutput ver;
    memset(&ver, 0, sizeof(ver));
    XRSLAMGetResult(XRSLAM_RESULT_VERSION, &ver);
    printf("CAPI_VERSION %s\n", ver.str_length > 0 ? ver.data : "(none)");

    XRSLAMState state = XRSLAM_STATE_TRACKING_FAIL;
    XRSLAMGetResult(XRSLAM_RESULT_STATE, &state);
    printf("CAPI_STATE0 %d\n", (int)state);

    XRSLAMIntrinsics K;
    XRSLAMGetResult(XRSLAM_INFO_INTRINSICS, &K);
    printf("CAPI_FX %.3f CY %.3f\n", K.fx, K.cy);

    /* 200 Hz IMU from t=0 to t=0.06, one 64x48 camera frame at t=0.05 */
    for (int i = 0; i <= 12; ++i) {
        double t = i * 0.005;
        XRSLAMGyroscope g = {{0.01, -0.02, 0.005}, t};
        XRSLAMPushSensorData(XRSLAM_SENSOR_GYROSCOPE, &g);
        XRSLAMAcceleration a = {{0.05, -0.03, 9.81}, t};
        XRSLAMPushSensorData(XRSLAM_SENSOR_ACCELERATION, &a);
    }
    enum { W = 64, H = 48, STRIDE = 72 };
    static unsigned char img[STRIDE * H];
    for (int y = 0; y < H; ++y)
        for (int x = 0; x < STRIDE; ++x)
            img[y * STRIDE + x] =
                (unsigned char)((x * 13 + y * 7 + (x * y) % 31) & 0xff);
    XRSLAMImage im;
    memset(&im, 0, sizeof(im));
    im.data = img;
    im.timeStamp = 0.05;
    im.stride = STRIDE;
    im.camera_id = 0;
    im.channel = 1;
    XRSLAMPushSensorData(XRSLAM_SENSOR_CAMERA, &im);
    XRSLAMRunOneFrame();

    XRSLAMGetResult(XRSLAM_RESULT_STATE, &state);
    printf("CAPI_STATE1 %d\n", (int)state);

    XRSLAMPose pose;
    XRSLAMGetResult(XRSLAM_RESULT_BODY_POSE, &pose);
    printf("CAPI_POSE %.6f %.6f %.6f %.6f | %.6f %.6f %.6f @ %.6f\n",
           pose.quaternion[0], pose.quaternion[1], pose.quaternion[2],
           pose.quaternion[3], pose.translation[0], pose.translation[1],
           pose.translation[2], pose.timestamp);

    XRSLAMFeatures feats;
    memset(&feats, 0, sizeof(feats));
    XRSLAMGetResult(XRSLAM_RESULT_FEATURES, &feats);
    printf("CAPI_NFEATURES %d\n", feats.num_features);
    if (feats.num_features > 0)
        printf("CAPI_FEAT0 %.2f %.2f\n", feats.features[0].x,
               feats.features[0].y);

    XRSLAMLandmarks lms;
    memset(&lms, 0, sizeof(lms));
    XRSLAMGetResult(XRSLAM_RESULT_LANDMARKS, &lms);
    printf("CAPI_NLANDMARKS %d\n", lms.num_landmarks);

    XRSLAMIMUBias bias;
    XRSLAMGetResult(XRSLAM_RESULT_BIAS, &bias);
    printf("CAPI_BIAS %.6f %.6f\n", bias.acc_bias.data[0],
           bias.gyr_bias.data[0]);

    XRSLAMDestroy();
    printf("CAPI_OK\n");
    return 0;
}
