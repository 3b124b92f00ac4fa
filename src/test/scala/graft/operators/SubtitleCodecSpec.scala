package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class SubtitleCodecSpec extends AnyFunSuite {

  test("vttCues parses ids, hourless timestamps, NOTE blocks, CRLF, settings") {
    val vtt = "WEBVTT some header text\r\n" +
      "\r\n" +
      "NOTE a comment\r\nstill the comment\r\n" +
      "\r\n" +
      "intro\r\n" +
      "00:00:01.500 --> 00:04.000 align:start\r\n" +
      "line one\r\n" +
      "line two\r\n" +
      "\r\n" +
      "01:02:03.250 --> 01:02:04.000\r\n" +
      "solo\r\n"
    val got = SubtitleCodec.vttCues(vtt)
    assert(got.contains(Seq(
      VttCue(1500L, 4000L, 2),
      VttCue(3723250L, 3724000L, 1))), s"$got")
  }

  test("vttCues rejects alien header, malformed timing, reversed cue; empty doc ok") {
    assert(SubtitleCodec.vttCues(null).isEmpty)
    assert(SubtitleCodec.vttCues("").isEmpty)
    assert(SubtitleCodec.vttCues("XEBVTT\n\n00:01.000 --> 00:02.000\nx\n")
      .isEmpty)
    assert(SubtitleCodec.vttCues("WEBVTT\n\n00:00 --> bogus\nx\n").isEmpty)
    assert(SubtitleCodec.vttCues(
      "WEBVTT\n\n00:05.000 --> 00:04.000\nx\n").isEmpty) // end < start
    // a headerless-looking cue id that never finds a timing line
    assert(SubtitleCodec.vttCues("WEBVTT\n\nid-only\n").isEmpty)
    // header with zero cues is a VALID empty caption file
    assert(SubtitleCodec.vttCues("WEBVTT\n").contains(Seq.empty[VttCue]))
    assert(SubtitleCodec.vttCues("WEBVTT\n\nNOTE only a comment\n")
      .contains(Seq.empty[VttCue]))
    // spec header grammar: "WEBVTT" then EOL/space/tab — a glued
    // suffix is an alien file, a space/tab-separated trailer is valid
    assert(SubtitleCodec.vttCues(
      "WEBVTTfoo\n\n00:01.000 --> 00:02.000\nx\n").isEmpty)
    assert(SubtitleCodec.vttCues("WEBVTT - with a comment\n")
      .contains(Seq.empty[VttCue]))
    assert(SubtitleCodec.vttCues("WEBVTT\tkind: captions\n")
      .contains(Seq.empty[VttCue]))
  }
}
