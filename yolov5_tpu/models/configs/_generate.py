"""Generates the bundled model-zoo configs.

Run `python -m yolov5_tpu.models.configs._generate` to (re)write the yaml
files. One template per family (P5 detect, P6 detect, P5 segment), five size
scalings each — the YOLOv5 n/s/m/l/x ladder. Architecture follows the v6.0
layout described in SURVEY.md §2.1: CSPDarknet backbone (Conv stem + C3
stages + SPPF) and a PANet head feeding the anchor-based Detect head.
"""

from pathlib import Path

HERE = Path(__file__).parent

SCALES = {  # (depth_multiple, width_multiple)
    "n": (0.33, 0.25),
    "s": (0.33, 0.50),
    "m": (0.67, 0.75),
    "l": (1.00, 1.00),
    "x": (1.33, 1.25),
}

P5_ANCHORS = """\
anchors:
  - [10, 13, 16, 30, 33, 23]       # P3/8
  - [30, 61, 62, 45, 59, 119]      # P4/16
  - [116, 90, 156, 198, 373, 326]  # P5/32
"""

P6_ANCHORS = """\
anchors:
  - [19, 27, 44, 40, 38, 94]         # P3/8
  - [96, 68, 86, 152, 180, 137]      # P4/16
  - [140, 301, 303, 264, 238, 542]   # P5/32
  - [436, 615, 739, 380, 925, 792]   # P6/64
"""

P5_BACKBONE = """\
backbone:
  # [from, repeats, block, args]
  - [-1, 1, Conv, [64, 6, 2, 2]]    # 0  P1/2  (6x6 s2 stem)
  - [-1, 1, Conv, [128, 3, 2]]      # 1  P2/4
  - [-1, 3, C3, [128]]              # 2
  - [-1, 1, Conv, [256, 3, 2]]      # 3  P3/8
  - [-1, 6, C3, [256]]              # 4
  - [-1, 1, Conv, [512, 3, 2]]      # 5  P4/16
  - [-1, 9, C3, [512]]              # 6
  - [-1, 1, Conv, [1024, 3, 2]]     # 7  P5/32
  - [-1, 3, C3, [1024]]             # 8
  - [-1, 1, SPPF, [1024, 5]]        # 9
"""

P5_HEAD_COMMON = """\
head:
  - [-1, 1, Conv, [512, 1, 1]]          # 10
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 6], 1, Concat, [1]]           # 12  + backbone P4
  - [-1, 3, C3, [512, False]]           # 13

  - [-1, 1, Conv, [256, 1, 1]]          # 14
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 4], 1, Concat, [1]]           # 16  + backbone P3
  - [-1, 3, C3, [256, False]]           # 17  -> P3/8

  - [-1, 1, Conv, [256, 3, 2]]          # 18
  - [[-1, 14], 1, Concat, [1]]          # 19  + head P4
  - [-1, 3, C3, [512, False]]           # 20  -> P4/16

  - [-1, 1, Conv, [512, 3, 2]]          # 21
  - [[-1, 10], 1, Concat, [1]]          # 22  + head P5
  - [-1, 3, C3, [1024, False]]          # 23  -> P5/32
"""

P5_DETECT = "  - [[17, 20, 23], 1, Detect, [nc, anchors]]\n"
P5_SEGMENT = "  - [[17, 20, 23], 1, Segment, [nc, anchors, 32, 256]]\n"

P6_BACKBONE = """\
backbone:
  # [from, repeats, block, args]
  - [-1, 1, Conv, [64, 6, 2, 2]]    # 0  P1/2
  - [-1, 1, Conv, [128, 3, 2]]      # 1  P2/4
  - [-1, 3, C3, [128]]              # 2
  - [-1, 1, Conv, [256, 3, 2]]      # 3  P3/8
  - [-1, 6, C3, [256]]              # 4
  - [-1, 1, Conv, [512, 3, 2]]      # 5  P4/16
  - [-1, 9, C3, [512]]              # 6
  - [-1, 1, Conv, [768, 3, 2]]      # 7  P5/32
  - [-1, 3, C3, [768]]              # 8
  - [-1, 1, Conv, [1024, 3, 2]]     # 9  P6/64
  - [-1, 3, C3, [1024]]             # 10
  - [-1, 1, SPPF, [1024, 5]]        # 11
"""

P6_HEAD = """\
head:
  - [-1, 1, Conv, [768, 1, 1]]          # 12
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 8], 1, Concat, [1]]           # 14  + backbone P5
  - [-1, 3, C3, [768, False]]           # 15

  - [-1, 1, Conv, [512, 1, 1]]          # 16
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 6], 1, Concat, [1]]           # 18  + backbone P4
  - [-1, 3, C3, [512, False]]           # 19

  - [-1, 1, Conv, [256, 1, 1]]          # 20
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 4], 1, Concat, [1]]           # 22  + backbone P3
  - [-1, 3, C3, [256, False]]           # 23  -> P3/8

  - [-1, 1, Conv, [256, 3, 2]]          # 24
  - [[-1, 20], 1, Concat, [1]]          # 25
  - [-1, 3, C3, [512, False]]           # 26  -> P4/16

  - [-1, 1, Conv, [512, 3, 2]]          # 27
  - [[-1, 16], 1, Concat, [1]]          # 28
  - [-1, 3, C3, [768, False]]           # 29  -> P5/32

  - [-1, 1, Conv, [768, 3, 2]]          # 30
  - [[-1, 12], 1, Concat, [1]]          # 31
  - [-1, 3, C3, [1024, False]]          # 32  -> P6/64

  - [[23, 26, 29, 32], 1, Detect, [nc, anchors]]
"""


def header(name, task):
    return (
        f"# yolov5_tpu model config: {name} ({task})\n"
        "# Schema: nc / depth_multiple / width_multiple / anchors / backbone / head,\n"
        "# rows are [from, repeats, block, args] (compatible with the YOLOv5 zoo).\n"
    )


def write(name, text):
    (HERE / f"{name}.yaml").write_text(text)
    print("wrote", name)


YOLOV3 = """\
nc: 80
depth_multiple: 1.0
width_multiple: 1.0
""" + P5_ANCHORS + """
backbone:
  # darknet53
  - [-1, 1, Conv, [32, 3, 1]]       # 0
  - [-1, 1, Conv, [64, 3, 2]]       # 1  P1/2
  - [-1, 1, Bottleneck, [64]]
  - [-1, 1, Conv, [128, 3, 2]]      # 3  P2/4
  - [-1, 2, Bottleneck, [128]]
  - [-1, 1, Conv, [256, 3, 2]]      # 5  P3/8
  - [-1, 8, Bottleneck, [256]]
  - [-1, 1, Conv, [512, 3, 2]]      # 7  P4/16
  - [-1, 8, Bottleneck, [512]]
  - [-1, 1, Conv, [1024, 3, 2]]     # 9  P5/32
  - [-1, 4, Bottleneck, [1024]]     # 10

head:
  - [-1, 1, Bottleneck, [1024, False]]   # 11
  - [-1, 1, Conv, [512, 1, 1]]
  - [-1, 1, Conv, [1024, 3, 1]]
  - [-1, 1, Conv, [512, 1, 1]]
  - [-1, 1, Conv, [1024, 3, 1]]          # 15  P5/32-large

  - [-2, 1, Conv, [256, 1, 1]]
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 8], 1, Concat, [1]]            # + backbone P4
  - [-1, 1, Bottleneck, [512, False]]
  - [-1, 1, Bottleneck, [512, False]]
  - [-1, 1, Conv, [256, 1, 1]]
  - [-1, 1, Conv, [512, 3, 1]]           # 22  P4/16-medium

  - [-2, 1, Conv, [128, 1, 1]]
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 6], 1, Concat, [1]]            # + backbone P3
  - [-1, 1, Bottleneck, [256, False]]
  - [-1, 2, Bottleneck, [256, False]]    # 27  P3/8-small

  - [[27, 22, 15], 1, Detect, [nc, anchors]]
"""

YOLOV3_SPP = YOLOV3.replace(
    "  - [-1, 1, Bottleneck, [1024, False]]   # 11",
    "  - [-1, 1, SPP, [512, [5, 9, 13]]]      # 11 (spp)",
)

YOLOV3_TINY = """\
nc: 80
depth_multiple: 1.0
width_multiple: 1.0
anchors:
  - [10, 14, 23, 27, 37, 58]       # P4/16
  - [81, 82, 135, 169, 344, 319]   # P5/32

backbone:
  - [-1, 1, Conv, [16, 3, 1]]          # 0
  - [-1, 1, nn.MaxPool2d, [2, 2, 0]]   # 1  P1/2
  - [-1, 1, Conv, [32, 3, 1]]
  - [-1, 1, nn.MaxPool2d, [2, 2, 0]]   # 3  P2/4
  - [-1, 1, Conv, [64, 3, 1]]
  - [-1, 1, nn.MaxPool2d, [2, 2, 0]]   # 5  P3/8
  - [-1, 1, Conv, [128, 3, 1]]
  - [-1, 1, nn.MaxPool2d, [2, 2, 0]]   # 7  P4/16
  - [-1, 1, Conv, [256, 3, 1]]         # 8
  - [-1, 1, nn.MaxPool2d, [2, 2, 0]]   # 9  P5/32
  - [-1, 1, Conv, [512, 3, 1]]
  - [-1, 1, nn.ZeroPad2d, [[0, 1, 0, 1]]]
  - [-1, 1, nn.MaxPool2d, [2, 1, 0]]   # 12

head:
  - [-1, 1, Conv, [1024, 3, 1]]
  - [-1, 1, Conv, [256, 1, 1]]         # 14
  - [-1, 1, Conv, [512, 3, 1]]         # 15  P5/32-large

  - [-2, 1, Conv, [128, 1, 1]]
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 8], 1, Concat, [1]]          # + backbone P4
  - [-1, 1, Conv, [256, 3, 1]]         # 19  P4/16-medium

  - [[19, 15], 1, Detect, [nc, anchors]]
"""

P2_ANCHORS = """\
anchors:
  - [4, 5, 8, 10, 13, 16]          # P2/4 (explicit; upstream uses autoanchor)
  - [10, 13, 16, 30, 33, 23]       # P3/8
  - [30, 61, 62, 45, 59, 119]      # P4/16
  - [116, 90, 156, 198, 373, 326]  # P5/32
"""

P2_HEAD = """\
head:
  - [-1, 1, Conv, [512, 1, 1]]               # 10
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 6], 1, Concat, [1]]
  - [-1, 3, C3, [512, False]]                # 13

  - [-1, 1, Conv, [256, 1, 1]]               # 14
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 4], 1, Concat, [1]]
  - [-1, 3, C3, [256, False]]                # 17  P3/8

  - [-1, 1, Conv, [128, 1, 1]]               # 18
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 2], 1, Concat, [1]]                # + backbone P2
  - [-1, 1, C3, [128, False]]                # 21  P2/4

  - [-1, 1, Conv, [128, 3, 2]]
  - [[-1, 18], 1, Concat, [1]]
  - [-1, 3, C3, [256, False]]                # 24  P3/8

  - [-1, 1, Conv, [256, 3, 2]]
  - [[-1, 14], 1, Concat, [1]]
  - [-1, 3, C3, [512, False]]                # 27  P4/16

  - [-1, 1, Conv, [512, 3, 2]]
  - [[-1, 10], 1, Concat, [1]]
  - [-1, 3, C3, [1024, False]]               # 30  P5/32

  - [[21, 24, 27, 30], 1, Detect, [nc, anchors]]
"""

P34_ANCHORS = """\
anchors:
  - [10, 13, 16, 30, 33, 23]       # P3/8
  - [30, 61, 62, 45, 59, 119]      # P4/16
"""

P34_HEAD = """\
head:
  - [-1, 1, Conv, [512, 1, 1]]               # 10
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 6], 1, Concat, [1]]
  - [-1, 3, C3, [512, False]]                # 13

  - [-1, 1, Conv, [256, 1, 1]]               # 14
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 4], 1, Concat, [1]]
  - [-1, 3, C3, [256, False]]                # 17  P3/8

  - [-1, 1, Conv, [256, 3, 2]]
  - [[-1, 14], 1, Concat, [1]]
  - [-1, 3, C3, [512, False]]                # 20  P4/16

  - [[17, 20], 1, Detect, [nc, anchors]]
"""

P7_ANCHORS = """\
anchors:
  - [11, 11, 13, 30, 29, 20]          # P3/8
  - [30, 46, 61, 38, 39, 92]          # P4/16
  - [78, 80, 146, 66, 79, 163]        # P5/32
  - [149, 150, 321, 143, 157, 303]    # P6/64
  - [257, 402, 359, 290, 524, 372]    # P7/128
"""

P7_BACKBONE = """\
backbone:
  - [-1, 1, Conv, [64, 6, 2, 2]]    # 0   P1/2
  - [-1, 1, Conv, [128, 3, 2]]      # 1   P2/4
  - [-1, 3, C3, [128]]
  - [-1, 1, Conv, [256, 3, 2]]      # 3   P3/8
  - [-1, 6, C3, [256]]
  - [-1, 1, Conv, [512, 3, 2]]      # 5   P4/16
  - [-1, 9, C3, [512]]
  - [-1, 1, Conv, [768, 3, 2]]      # 7   P5/32
  - [-1, 3, C3, [768]]
  - [-1, 1, Conv, [1024, 3, 2]]     # 9   P6/64
  - [-1, 3, C3, [1024]]
  - [-1, 1, Conv, [1280, 3, 2]]     # 11  P7/128
  - [-1, 3, C3, [1280]]
  - [-1, 1, SPPF, [1280, 5]]        # 13
"""

P7_HEAD = """\
head:
  - [-1, 1, Conv, [1024, 1, 1]]              # 14
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 10], 1, Concat, [1]]
  - [-1, 3, C3, [1024, False]]               # 17  P6

  - [-1, 1, Conv, [768, 1, 1]]               # 18
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 8], 1, Concat, [1]]
  - [-1, 3, C3, [768, False]]                # 21  P5

  - [-1, 1, Conv, [512, 1, 1]]               # 22
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 6], 1, Concat, [1]]
  - [-1, 3, C3, [512, False]]                # 25  P4

  - [-1, 1, Conv, [256, 1, 1]]               # 26
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 4], 1, Concat, [1]]
  - [-1, 3, C3, [256, False]]                # 29  P3/8

  - [-1, 1, Conv, [256, 3, 2]]
  - [[-1, 26], 1, Concat, [1]]
  - [-1, 3, C3, [512, False]]                # 32  P4/16

  - [-1, 1, Conv, [512, 3, 2]]
  - [[-1, 22], 1, Concat, [1]]
  - [-1, 3, C3, [768, False]]                # 35  P5/32

  - [-1, 1, Conv, [768, 3, 2]]
  - [[-1, 18], 1, Concat, [1]]
  - [-1, 3, C3, [1024, False]]               # 38  P6/64

  - [-1, 1, Conv, [1024, 3, 2]]
  - [[-1, 14], 1, Concat, [1]]
  - [-1, 3, C3, [1280, False]]               # 41  P7/128

  - [[29, 32, 35, 38, 41], 1, Detect, [nc, anchors]]
"""

FPN_HEAD = """\
head:
  # top-down only (no PAN down path)
  - [-1, 3, C3, [1024, False]]               # 10  P5/32-large

  - [-1, 1, Conv, [512, 1, 1]]
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 6], 1, Concat, [1]]
  - [-1, 3, C3, [512, False]]                # 14  P4/16-medium

  - [-1, 1, Conv, [256, 1, 1]]
  - [-1, 1, nn.Upsample, [None, 2, nearest]]
  - [[-1, 4], 1, Concat, [1]]
  - [-1, 3, C3, [256, False]]                # 18  P3/8-small

  - [[18, 14, 10], 1, Detect, [nc, anchors]]
"""

BIFPN_HEAD = P5_HEAD_COMMON.replace(
    "  - [[-1, 14], 1, Concat, [1]]          # 19  + head P4",
    "  - [[-1, 14, 6], 1, Concat, [1]]       # 19  + head P4 + backbone P4 (bifpn)",
)

GHOST_BACKBONE = P5_BACKBONE.replace("C3,", "C3Ghost,").replace("Conv, [1024, 3, 2]", "GhostConv, [1024, 3, 2]")
GHOST_HEAD = (P5_HEAD_COMMON + P5_DETECT).replace("C3,", "C3Ghost,").replace(
    "Conv, [256, 3, 2]", "GhostConv, [256, 3, 2]").replace(
    "Conv, [512, 3, 2]", "GhostConv, [512, 3, 2]")

TRANSFORMER_BACKBONE = P5_BACKBONE.replace(
    "  - [-1, 3, C3, [1024]]             # 8", "  - [-1, 3, C3TR, [1024]]           # 8 (transformer stage)")


def main():
    for letter, (gd, gw) in SCALES.items():
        scale = f"nc: 80\ndepth_multiple: {gd}\nwidth_multiple: {gw}\n"
        # P5 detect
        write(
            f"yolov5{letter}",
            header(f"yolov5{letter}", "detect")
            + scale + P5_ANCHORS + "\n" + P5_BACKBONE + "\n" + P5_HEAD_COMMON + P5_DETECT,
        )
        # P5 segment
        write(
            f"yolov5{letter}-seg",
            header(f"yolov5{letter}-seg", "segment")
            + scale + P5_ANCHORS + "\n" + P5_BACKBONE + "\n" + P5_HEAD_COMMON + P5_SEGMENT,
        )
        # P6 detect @1280
        write(
            f"yolov5{letter}6",
            header(f"yolov5{letter}6", "detect, P6/1280")
            + scale + P6_ANCHORS + "\n" + P6_BACKBONE + "\n" + P6_HEAD,
        )

    # hub variants (s-scale where upstream ships one size)
    s_scale = "nc: 80\ndepth_multiple: 0.33\nwidth_multiple: 0.50\n"
    write("yolov3", header("yolov3", "detect, darknet53") + YOLOV3)
    write("yolov3-spp", header("yolov3-spp", "detect, darknet53+SPP") + YOLOV3_SPP)
    write("yolov3-tiny", header("yolov3-tiny", "detect, 2-level tiny") + YOLOV3_TINY)
    write("yolov5-p2",
          header("yolov5-p2", "detect, P2-P5 high-res small objects")
          + s_scale + P2_ANCHORS + "\n" + P5_BACKBONE + "\n" + P2_HEAD)
    write("yolov5-p34",
          header("yolov5-p34", "detect, P3-P4 only")
          + s_scale + P34_ANCHORS + "\n" + P5_BACKBONE + "\n" + P34_HEAD)
    write("yolov5-p6",
          header("yolov5-p6", "detect, P3-P6")
          + s_scale + P6_ANCHORS + "\n" + P6_BACKBONE + "\n" + P6_HEAD)
    write("yolov5-p7",
          header("yolov5-p7", "detect, P3-P7 @1280+")
          + s_scale + P7_ANCHORS + "\n" + P7_BACKBONE + "\n" + P7_HEAD)
    write("yolov5-fpn",
          header("yolov5-fpn", "detect, FPN top-down head")
          + s_scale + P5_ANCHORS + "\n" + P5_BACKBONE + "\n" + FPN_HEAD)
    write("yolov5-panet",
          header("yolov5-panet", "detect, explicit PANet head (same as default)")
          + s_scale + P5_ANCHORS + "\n" + P5_BACKBONE + "\n" + P5_HEAD_COMMON + P5_DETECT)
    write("yolov5-bifpn",
          header("yolov5-bifpn", "detect, BiFPN-style extra skip concat")
          + s_scale + P5_ANCHORS + "\n" + P5_BACKBONE + "\n" + BIFPN_HEAD + P5_DETECT)
    write("yolov5s-ghost",
          header("yolov5s-ghost", "detect, GhostNet blocks")
          + s_scale + P5_ANCHORS + "\n" + GHOST_BACKBONE + "\n" + GHOST_HEAD)
    write("yolov5s-transformer",
          header("yolov5s-transformer", "detect, C3TR transformer stage")
          + s_scale + P5_ANCHORS + "\n" + TRANSFORMER_BACKBONE + "\n"
          + P5_HEAD_COMMON + P5_DETECT)
    write("yolov5s-LeakyReLU",
          header("yolov5s-LeakyReLU", "detect, LeakyReLU activation")
          + s_scale + "activation: leaky_relu\n" + P5_ANCHORS + "\n"
          + P5_BACKBONE + "\n" + P5_HEAD_COMMON + P5_DETECT)


if __name__ == "__main__":
    main()
