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


if __name__ == "__main__":
    main()
